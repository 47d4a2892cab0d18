from .extract_stream import extract_stream, start_file_stream  # noqa: F401
from .stateful import conversation_sessions  # noqa: F401
