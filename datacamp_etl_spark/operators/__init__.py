"""Data-plane operators.

- ``mapping``    typed-literal expression DSL (reference P1)
- ``loading``    mapped append / update-join / finalize / watermark (K1-K4)
- ``cdc``        MD5 digest + table diff (P4, J1, J2)
- ``dedup``      exact + near-duplicate detection [EXT]
- ``similarity`` vector similarity search [EXT]
- ``text``       text-analysis operators [EXT]
- ``multimodal`` binary-column (image/audio/video) plumbing [EXT]
"""

from datacamp_etl_spark.operators.mapping import (  # noqa: F401
    col_value,
    date_value,
    mapping_to_columns,
    number_value,
    sql_value,
    string_value,
)
