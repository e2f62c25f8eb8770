"""F11: schema-migration shim — the graft of the reference's state-dict key
renamer (`pipeline.py:18-37`, `net.py:24-34` strip the ``module.`` prefix so
checkpoints load across wrappers).

Tables from older pipeline versions carry stale column names/types; this
shim renames and re-casts declaratively so downstream operators see one
schema.  Pure metadata ops (Project nodes) — zero data movement."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def migrate_schema(
    df: DataFrame,
    renames: dict[str, str] | None = None,
    casts: dict[str, str] | None = None,
    strip_prefix: str | None = None,
) -> DataFrame:
    """Apply column renames, dtype casts, and a legacy-prefix strip.

    `strip_prefix` mirrors the reference's ``module.`` removal: any column
    starting with it is renamed to the suffix (conflicts raise)."""
    out = df
    mapping: dict[str, str] = {}
    if strip_prefix:
        for c in out.columns:
            if c.startswith(strip_prefix):
                mapping[c] = c[len(strip_prefix):]
    mapping.update(renames or {})
    new_names = [mapping.get(c, c) for c in out.columns]
    if len(set(new_names)) != len(new_names):
        raise ValueError(f"rename collision: {new_names}")
    # ONE atomic select, never sequential withColumnRenamed: applying
    # renames one at a time lets an intermediate name collide with a
    # not-yet-renamed column (swap {'a':'b','b':'a'} or chain
    # {'x':'y','y':'z'} produced duplicate columns)
    if mapping:
        # backtick-quote: F.col() parses bare dots as struct access, and
        # legacy names like `module.label` contain them by construction
        out = out.select(*[
            F.col("`" + c.replace("`", "``") + "`").alias(mapping.get(c, c))
            for c in out.columns
        ])
    for col, dtype in (casts or {}).items():
        out = out.withColumn(col, F.col(col).cast(dtype))
    return out
