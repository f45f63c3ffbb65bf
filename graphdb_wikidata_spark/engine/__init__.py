"""SPARQL engine: parser -> algebra -> DataFrame compiler.

Pipeline (reference lifecycle, SURVEY §3): SPARQL text
-> ``parser.parse_query`` (recursive descent, replaces the spargebra
crate) -> ``algebra`` operator tree (the reference's Operator IR,
calc_data_types.rs:117-205) -> ``compiler.compile`` emits a DataFrame
plan that Catalyst optimizes and executes — replacing the reference's
tuple-at-a-time interpreter (calc_engine.rs:105-351) wholesale.
"""

from .api import GraphEngine  # noqa: F401
