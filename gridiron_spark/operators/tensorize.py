"""Long→wide tensorization: per-play (frames × players × features) blocks.

The reference documents this as a driver-side Python loop over collected plays
(docs/DATA_LAKE_GUIDE.md:73-109: pivot each play to a padded matrix, cap
max_frames). At scale that loop is the grouped-map pandas UDF: one shuffle on
the play key, then each play pivots independently inside an Arrow batch —
thousands of plays tensorize in parallel, nothing touches the driver.

Contract (mirrors the documented recipe):
- player axis ordered by nflId ascending, ball (null nflId) last;
- frame axis ordered by frameId, truncated/padded to ``max_frames``;
- padding value 0.0; per-play ``n_frames``/``n_players`` carried alongside so
  consumers can mask.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_FEATURES = ("x", "y", "s", "a")


def tensor_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("gameId", T.LongType()),
            T.StructField("playId", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_players", T.IntegerType()),
            T.StructField(
                "tensor",
                T.ArrayType(T.ArrayType(T.ArrayType(T.FloatType()))),
            ),
        ]
    )


def tensorize_plays(
    df: DataFrame,
    features: tuple[str, ...] = DEFAULT_FEATURES,
    max_frames: int = 64,
    max_players: int = 23,
) -> DataFrame:
    """groupBy(play).applyInPandas → one padded 3-D block per play."""
    import numpy as np
    import pandas as pd

    feat_list = list(features)

    def _pivot(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["frameId", "nflId"], na_position="last")
        frames = sorted(pdf["frameId"].unique())[:max_frames]
        # stable player order: nflId ascending, ball (NaN) last
        players = list(pdf["nflId"].drop_duplicates().sort_values(na_position="last"))[
            :max_players
        ]
        block = np.zeros((max_frames, max_players, len(feat_list)), dtype=np.float32)
        fidx = {f: i for i, f in enumerate(frames)}
        pidx = {(-1 if pd.isna(p) else p): i for i, p in enumerate(players)}
        sub = pdf[pdf["frameId"].isin(fidx)]
        fi = sub["frameId"].map(fidx).to_numpy()
        pi = sub["nflId"].fillna(-1).map(pidx).to_numpy()
        vals = sub[feat_list].to_numpy(dtype=np.float32, na_value=0.0)
        block[fi, pi, :] = vals
        return pd.DataFrame(
            {
                "gameId": [int(pdf["gameId"].iloc[0])],
                "playId": [int(pdf["playId"].iloc[0])],
                "n_frames": [len(frames)],
                "n_players": [len(players)],
                "tensor": [block.tolist()],
            }
        )

    return (
        df.select("gameId", "playId", "nflId", "frameId", *feat_list)
        .groupBy("gameId", "playId")
        .applyInPandas(_pivot, schema=tensor_schema())
    )
