from .extract_stream import (  # noqa: F401
    extract_stream,
    start_file_stream,
    streaming_conv_metrics,
    streaming_dedup_exact,
)
from .bloom_ingest import (  # noqa: F401
    bloom_ingest_batch,
    start_bloom_ingest_dedup,
)
from .stateful import conversation_sessions  # noqa: F401
