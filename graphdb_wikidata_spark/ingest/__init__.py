from .wikidata import load_dump, write_statements  # noqa: F401
