from .pipeline import StreamingIngest  # noqa: F401
