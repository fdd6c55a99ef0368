"""Column masking at ingest: pseudonymize/redact configured columns as
change records flow to the lake, so protected values NEVER land in
storage (the GDPR/PCI posture; Debezium models the same need as its
column.mask.with/column.hash SMTs — the reference has no equivalent, a
listener would have to scrub by hand: MariadbCdcListener.java:17-22).

Masks operate on the DECODED canonical string images (after
functions.typedec), per column name, on both before and after images —
an UPDATE's before-image would otherwise leak the prior plaintext to
changes_sink consumers. Everything is a Catalyst map-transform
projection: no Python, no shuffle, and pipeline.decoded_changes adds the
stage to the PLAN only when masks are configured (same zero-cost-gate
discipline as the wire-decode and bitmap stages).

Modes:
  sha256  - one-way pseudonym, join-stable across tables/batches
  md5     - shorter pseudonym, same property
  redact  - constant '***' (value destroyed, presence preserved)
  null    - drop the value entirely (column stays in the image)
  last4   - '***' + final 4 chars (the PAN/phone display convention)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MASK_MODES = ("sha256", "md5", "redact", "null", "last4")


def _masked_value(mode: str, value: Column) -> Column:
    if mode == "sha256":
        return F.sha2(value, 256)
    if mode == "md5":
        return F.md5(value)
    if mode == "redact":
        return F.lit("***")
    if mode == "null":
        return F.lit(None).cast("string")
    if mode == "last4":
        return F.concat(
            F.lit("***"),
            F.when(
                F.length(value) >= 4, F.substring(value, -4, 4)
            ).otherwise(value),
        )
    raise ValueError(f"unknown mask mode {mode!r}; use one of {MASK_MODES}")


def mask_images(changes: DataFrame, masks: dict[str, str]) -> DataFrame:
    """Apply column masks to the before/after image maps. Null values
    stay null (there is nothing to protect and masking them would turn
    absence into a fake pseudonym)."""
    for mode in masks.values():
        if mode not in MASK_MODES:
            raise ValueError(
                f"unknown mask mode {mode!r}; use one of {MASK_MODES}"
            )

    def rewrite(img: Column) -> Column:
        def entry(e):
            k, v = e["key"], e["value"]
            masked = v
            for col, mode in sorted(masks.items()):
                masked = F.when(
                    (k == col) & v.isNotNull(), _masked_value(mode, v)
                ).otherwise(masked)
            return F.struct(k.alias("key"), masked.alias("value"))

        return F.map_from_entries(F.transform(F.map_entries(img), entry))

    out = changes
    for side in ("before", "after"):
        out = out.withColumn(
            side,
            F.when(
                F.col(side).isNotNull(), rewrite(F.col(side))
            ).otherwise(F.col(side)),
        )
    return out
