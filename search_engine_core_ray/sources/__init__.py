from .pages import read_pages, documents_to_pages, read_documents_as_pages

__all__ = ["read_pages", "documents_to_pages", "read_documents_as_pages"]
