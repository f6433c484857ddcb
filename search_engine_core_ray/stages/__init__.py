from .extract import HtmlExtract, extract_page
from .postings import explode_postings

__all__ = ["HtmlExtract", "extract_page", "explode_postings"]
