from .wikidata import (  # noqa: F401
    load_dump,
    run_stream_to_parquet,
    statements_from_lines,
    stream_dump,
    write_statements,
)
