from .schema import (  # noqa: F401
    COORD_T,
    QTY_T,
    STATEMENT_COLUMNS,
    TERM_T,
    TIME_T,
    empty_term,
    make_term,
    statements_from_quads,
)
