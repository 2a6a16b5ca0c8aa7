"""Python UDTFs (Spark 4): the table-function escape hatch (SURVEY §2.10).

The reference's ``defmapcatop`` (U2 — one input tuple → N output tuples)
maps to ``explode`` over built-in array exprs in 99% of cases, and this
engine does exactly that everywhere hot (see operators/joins.py spines,
dedup shingles). A Python UDTF is the LAST-RESORT form for generators
whose logic genuinely can't be a Column expression — imperative parsing,
stateful per-row expansion, external-library row processing.

Scale caveat (same as every Python-row path): a UDTF runs row-at-a-time
Python inside the task. Use it at the edges (config expansion, small
dimension synthesis, weird-format parsing), never on the fact-table hot
path — there, ``explode``/``mapInPandas`` stay JVM/Arrow-side.
``useArrow=True`` at least batches the transport.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, start_tok int, end_tok int, piece string")
class ChunkSpans:
    """Overlapping token-window chunker as a table function — the UDTF
    twin of ``operators/text.chunk_documents`` for ad-hoc SQL use:
    ``SELECT c.* FROM docs, LATERAL chunk_spans(text, 5, 2) c``.

    Imperative loop per row (window arithmetic with remainder handling) —
    exactly the shape that earns the escape hatch; the DataFrame-native
    chunker remains the corpus-scale path (sequence + transform, JVM-side).
    """

    def eval(self, text: str, window: int = 5, overlap: int = 2):
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        step = max(1, window - overlap)
        cid = 0
        for start in range(0, len(toks), step):
            end = min(start + window, len(toks))
            yield cid, start, end, " ".join(toks[start:end])
            cid += 1
            if end == len(toks):
                break


def register_udtfs(spark) -> None:
    """Register the UDTF surface under SQL names (idempotent)."""
    spark.udtf.register("chunk_spans", ChunkSpans)
