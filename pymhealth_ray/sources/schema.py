"""Canonical Arrow schemas and validation.

The primary input table is exactly BASELINE.json ``input_hint``:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
plus the derived event-time axis ``ts_ns: int64`` (canonical unit is
nanoseconds — reference:heart/qrs.py:102, heart/hrv.py:84 normalize to ns).
"""

from __future__ import annotations

import pyarrow as pa

SEQUENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("ts_ns", pa.int64()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

INPUT_HINT_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def validate_sequences(table: pa.Table) -> None:
    """Ingest validation: schema fields present with expected types and the
    ``n_tok == len(tokens)`` invariant (FIXTURES.md F1).
    """
    for field in SEQUENCES_SCHEMA:
        if table.schema.field(field.name).type != field.type:
            raise TypeError(
                f"column {field.name}: expected {field.type}, got "
                f"{table.schema.field(field.name).type}"
            )
    import pyarrow.compute as pc

    lens = pc.list_value_length(table["tokens"])
    ok = pc.all(pc.equal(pc.cast(lens, pa.int32()), table["n_tok"])).as_py()
    if not ok:
        raise ValueError("n_tok != len(tokens) for at least one row")
