"""Physical join-strategy hints, config-gated.

Round-4 background: at 3M input rows, AQE's runtime byte estimate for
corpus-scaled join sides (bucket-stat tables, the wide bottom-k array
table, the CC loop's per-node min tables) came in under the broadcast
threshold — array columns are under-estimated — and the driver-side
broadcast hash build OOMed the JVM.  Every such side therefore carries an
explicit ``shuffle_hash`` hint.  The hint is CONFIG-GATED because it also
forbids genuinely-beneficial broadcasts on small corpora (20k–100k rows),
where every side fits comfortably; the round-5 A/B (BENCH/HINTS_AB.json)
measures that cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mhap_spark.config import MhapConfig


def scaled(df: DataFrame, cfg: MhapConfig) -> DataFrame:
    """Mark ``df`` as a corpus-scaled join side: hinted ``shuffle_hash``
    unless the config opts out (``cfg.no_broadcast_hints=False``, small
    interactive runs where broadcast is safe and faster)."""
    return df.hint("shuffle_hash") if cfg.no_broadcast_hints else df
