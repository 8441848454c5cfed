"""Python UDTFs (Spark 4 user-defined table functions).

API-surface coverage for the one lateral-explode shape the engine otherwise
expresses as JVM expression trees: a UDTF is the right tool when the
per-row fan-out logic needs real Python (a tokenizer model, a decoder)
rather than SQL-expressible windows.  The expression-tree twin
(functions/text.token_chunks) IS the fast path — Python UDTFs are
row-at-a-time; keep them off the 100 TB hot path unless the logic demands
Python, and then prefer arrow-optimized evaluation (useArrow=True below)."""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk: string", useArrow=True)
class ChunkUDTF:
    """Token-window chunker as a table function: windows of 32 tokens
    starting every 16 tokens over normalized text — the same contract as
    functions/text.token_chunks (one chunk per start offset < n_tokens;
    empty/blank text yields one empty chunk, mirroring the SQL twin's
    RANGE(0, GREATEST(n,1), 16) start set; NULL text yields ZERO rows,
    mirroring chunks(NULL) = NULL -> explode emits nothing)."""

    SIZE = 32
    STRIDE = 16

    def eval(self, text: str):  # noqa: D102 - UDTF protocol method
        if text is None:
            return  # SQL twin: explode(NULL array) -> zero lateral rows
        # ASCII \s to match the Java regexp in text.normalize — Python's
        # \s is Unicode-wide by default and would collapse \u00a0 etc.,
        # silently diverging from the expression-tree twin on non-ASCII
        # .strip(" ") not .strip(): Python's bare strip is Unicode-wide
        # and would eat the NBSP the Java/DuckDB TRIM keeps
        norm = re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip(" ")
        toks = norm.split(" ") if norm else []
        for s in range(0, max(len(toks), 1), self.STRIDE):
            yield (" ".join(toks[s : s + self.SIZE]),)


def register(spark) -> None:
    """Register all UDTFs for SQL lateral-join use."""
    spark.udtf.register("chunk_udtf", ChunkUDTF)
