"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators over mapInPandas. The decode kernels themselves are
STUBBED (no image/audio libs in this container — clearly marked), but
the Spark-side contract is real and tested: schema, batch shape,
partition sizing, deterministic fake features.

Scale notes: binary payloads dominate row size → keep
spark.sql.files.maxPartitionBytes moderate and let AQE size batches;
never collect payloads to the driver; feature extraction emits
fixed-width arrays so downstream similarity ops (operators/similarity)
consume them directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

DECODED_SCHEMA = (
    "id BIGINT, n_bytes BIGINT, modality STRING, feature ARRAY<DOUBLE>"
)


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature: bytes → fixed-width vector via
    chunk sums. Replaces the real decoder output for tests; same
    shape/dtype contract."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return [0.0] * dim
    chunks = np.array_split(arr.astype(np.float64), dim)
    return [float(c.sum() % 997) for c in chunks]


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    modality: str = "image",
    real_decode: bool = False,
) -> DataFrame:
    """binary payload → (id, n_bytes, modality, feature[FEATURE_DIM]).

    mapInPandas: one Arrow batch in, one out — payloads never leave the
    executor. real_decode=True is the production path (PIL/ffmpeg);
    STUBBED here."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                # Production: PIL.Image.open / soundfile / pyav per
                # modality. Not available in this container.
                raise NotImplementedError(
                    "real decode requires image/audio libs; "
                    "use real_decode=False for the deterministic stub"
                )
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(
                        lambda b: 0 if b is None else len(b)
                    ).astype("int64"),
                    "modality": modality,
                    "feature": payloads.map(
                        lambda b: _fake_feature(bytes(b or b""))
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, DECODED_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 1024,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling contract demo: one output row per sampled offset
    (for video this is per-frame; here offsets into the payload). Pure
    Spark: posexplode over a computed offset sequence — the fan-out
    shape a real frame sampler has."""
    n = F.length(F.col(payload_col))
    offsets = F.sequence(
        F.lit(0),
        F.greatest(n - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
