"""Engine operators.

Each module exposes documented DataFrame -> DataFrame functions.  These are
the user-visible twins of the reference's shuffle-path dataflow (SURVEY.md
§2.A -> §2.B mapping): Spark's own sort-based shuffle executes the exchange;
the modules here define the semantics above it.
"""

from shuttle_spark.operators import (  # noqa: F401
    components,
    dedup,
    integrity,
    lineage,
    multimodal,
    neardup,
    pipeline,
    relational,
    similarity,
)
