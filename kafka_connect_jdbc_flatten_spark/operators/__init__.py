from .explode import flatten_records  # noqa: F401
from .lww import lww_reduce  # noqa: F401
