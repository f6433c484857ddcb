from .extract import HtmlExtract, extract_page
from .postings import TokenizeFields, explode_postings

__all__ = ["HtmlExtract", "extract_page", "TokenizeFields", "explode_postings"]
