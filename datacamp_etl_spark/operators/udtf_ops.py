"""Python UDTFs (Spark 3.5+/4 table functions) [EXT].

Table-valued transforms that expand one row into many — the lateral
shape a training-data pipeline uses for chunking, exploding structured
annotations, or decoding containers. Prefer the JVM operators
(text.chunk_text, F.explode) in hot paths; a UDTF is the escape hatch
when the per-row expansion is genuinely Python (custom tokenizers,
format parsers) while keeping it inside the distributed plan — the
row never visits the driver, unlike a collect()-side loop.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string")
class CharChunkUDTF:
    """Fixed-size character windows of a string; NULL text yields no
    rows. Used via ``spark.udtf.register`` + LATERAL join so each
    document expands executor-side."""

    def eval(self, text: str, size: int):
        if text is None or size is None or size <= 0:
            return
        for i in range(0, len(text), size):
            yield (i // size, text[i : i + size])


def register_udtfs(spark) -> None:
    """Idempotent registration of the UDTF surface on a session."""
    spark.udtf.register("char_chunks", CharChunkUDTF)
