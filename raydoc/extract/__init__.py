from raydoc.extract.html_extract import extract_page, html_to_text  # noqa: F401
from raydoc.extract.chunker import chunk_document  # noqa: F401
