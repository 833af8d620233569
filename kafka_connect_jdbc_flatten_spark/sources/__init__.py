from .changelog import (  # noqa: F401
    CHANGELOG_SCHEMA,
    TRANSCRIPT_KEY_SCHEMA,
    TRANSCRIPT_VALUE_SCHEMA,
    transcript_changelog,
    transcript_flatten_config,
    write_changelog_chunks,
)
from .incremental import IncrementalCriteria  # noqa: F401
