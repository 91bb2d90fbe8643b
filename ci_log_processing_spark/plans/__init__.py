from .pipeline import parse_transcripts, full_pipeline  # noqa: F401
