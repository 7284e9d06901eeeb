from crawler_tjce_ray.sources.pages import (
    PAGES_SCHEMA,
    read_pages,
    write_pages_corpus,
)

__all__ = ["PAGES_SCHEMA", "read_pages", "write_pages_corpus"]
