from .extract import RESULT_SCHEMA, extract, extract_exploded  # noqa: F401
