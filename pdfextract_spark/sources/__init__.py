from .tables import load_table, load_tables  # noqa: F401
from .transcripts import synth_transcripts  # noqa: F401
