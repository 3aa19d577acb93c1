"""Key-derivation expressions (reference: sender.go:136-201, T5/T6 in SURVEY.md).

All pure Column builders — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from persistor_spark.schemas import PROMOTED_ATTRIBUTE_KEYS


def unique_id(broker_id: Column | str = "broker_id", broker_msg_id: Column | str = "broker_msg_id") -> Column:
    """`unique_id = broker_id || '_' || broker_msg_id` (sender.go:173)."""
    b = F.col(broker_id) if isinstance(broker_id, str) else broker_id
    m = F.col(broker_msg_id) if isinstance(broker_msg_id, str) else broker_msg_id
    return F.concat(b, F.lit("_"), m)


def index_source_key(
    source_key: Column | str = "business_source_key",
    object_key: Column | str = "business_object_key",
) -> Column:
    """`bsk || '_' || bok` iff both present AND non-empty, else NULL
    (sender.go:158: `len(bsk) > 0 && len(bok) > 0` — an empty-string business
    key leaves index_source_key unset, it does not produce '_' / 'src_')."""
    s = F.col(source_key) if isinstance(source_key, str) else source_key
    o = F.col(object_key) if isinstance(object_key, str) else object_key
    non_empty = s.isNotNull() & (F.length(s) > 0) & o.isNotNull() & (F.length(o) > 0)
    return F.when(non_empty, F.concat(s, F.lit("_"), o))


def additional_metadata(attributes: Column | str = "attributes") -> Column:
    """User attributes minus the promoted business keys (sender.go:155-156
    deletes them from the map after extraction)."""
    a = F.col(attributes) if isinstance(attributes, str) else attributes
    promoted = F.array(*[F.lit(k) for k in PROMOTED_ATTRIBUTE_KEYS])
    return F.map_filter(a, lambda k, _v: ~F.array_contains(promoted, k))
