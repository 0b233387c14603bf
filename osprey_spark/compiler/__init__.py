"""SML → Spark compiler.

Replaces the reference's per-event dataflow-DAG interpreter
(ref: osprey_worker/src/osprey/engine/executor/executor.py:308-417)
with a compile step: every SML feature becomes one Spark SQL
``Column`` expression, the whole program becomes a single ``select``
projection, and Catalyst does common-subexpression reuse, constant
folding and whole-stage codegen. Effects (verdicts / label mutations)
become conditional array-append expressions.
"""

from .compile import CompiledRuleset, InputBindings, compile_ruleset, compile_query_filter  # noqa: F401
from .labels_config import LabelInfo, LabelsConfig  # noqa: F401
