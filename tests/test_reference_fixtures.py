"""End-to-end ingest of the reference's REAL fixture CSVs — the only proof
that alias resolution works against actual heterogeneous competition headers
(reference Makefile:24-26 `ingest-test-data`), not just synthetic frames.

2018 file: camelCase headers + time/event/team/dis/route extras.
2023 file: snake_case prediction-dataset headers + player metadata columns
with unsigned reference dtypes (widened to signed + declared range here).
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from gridiron_spark.ingest import LakeIngestor
from gridiron_spark.pool import Pool

CONFIGS = Path(__file__).parent.parent / "gridiron_spark/configs"
REF_2018 = Path("/root/reference/test_data/2018/2018-20plays.csv")
REF_2023 = Path("/root/reference/test_data/2023/2023-20plays.csv")

pytestmark = pytest.mark.skipif(
    not (REF_2018.exists() and REF_2023.exists()),
    reason="reference fixture CSVs not available",
)


@pytest.fixture(scope="module")
def lake_2018(spark, tmp_path_factory):
    lake = tmp_path_factory.mktemp("lake2018")
    ing = LakeIngestor(spark, CONFIGS / "bdb-2018.yaml", lake)
    summary = ing.ingest(str(REF_2018))
    return lake, summary


@pytest.fixture(scope="module")
def lake_2023(spark, tmp_path_factory):
    lake = tmp_path_factory.mktemp("lake2023")
    ing = LakeIngestor(spark, CONFIGS / "bdb-2026.yaml", lake)
    summary = ing.ingest(str(REF_2023))
    return lake, summary


def test_2018_counts_and_layout(lake_2018):
    lake, s = lake_2018
    assert s.n_rows == 21403
    assert s.n_games == 10
    assert s.n_plays == 21
    game_dirs = sorted(Path(lake).glob("season=2018/gameId=*"))
    assert len(game_dirs) == 10, "expected season=2018/gameId=* Hive layout"


def test_2018_alias_resolution(spark, lake_2018):
    lake, _ = lake_2018
    df = Pool(spark, lake).scan()
    # headers resolved via the canonical spelling (camelCase source)
    for c in ("gameId", "playId", "nflId", "frameId", "x", "y", "s", "a",
              "dis", "o", "dir", "event", "team", "position", "route",
              "displayName", "jerseyNumber", "time", "playDirection"):
        assert c in df.columns, c
    # the ball has no nflId: exactly the source's 1445 null-id rows survive
    assert df.filter(F.col("nflId").isNull()).count() == 1445
    # float-formatted ids ("4365.0") cast cleanly to int
    assert dict(df.dtypes)["nflId"] == "int"
    assert df.filter(F.col("displayName") == "Brandon Carr").count() > 0


def test_2023_counts_and_layout(lake_2023):
    lake, s = lake_2023
    assert s.n_rows == 8699
    assert s.n_games == 10
    assert s.n_plays == 23
    game_dirs = sorted(Path(lake).glob("season=2023/gameId=*"))
    assert len(game_dirs) == 10, "expected season=2023/gameId=* Hive layout"


def test_2023_snake_case_aliases_and_widened_types(spark, lake_2023):
    lake, _ = lake_2023
    df = Pool(spark, lake).scan()
    dt = dict(df.dtypes)
    # snake_case headers landed on camelCase canonical names
    assert dt["playerToPredict"] == "boolean"
    assert dt["frameId"] == "smallint"  # Int16 -> short
    assert dt["absoluteYardlineNumber"] == "smallint"  # UInt8 -> short[0,255]
    assert dt["playerWeight"] == "int"  # UInt16 -> int[0,65535]
    assert dt["numFramesOutput"] == "smallint"
    # real data stays inside the declared unsigned ranges (nothing nulled)
    row = df.agg(
        F.min("absoluteYardlineNumber").alias("lo"),
        F.max("absoluteYardlineNumber").alias("hi"),
        F.max("playerWeight").alias("wmax"),
        F.count(F.when(F.col("absoluteYardlineNumber").isNull(), 1)).alias("n_null"),
    ).first()
    assert (row.lo, row.hi, row.wmax, row.n_null) == (26, 104, 265, 0)
    assert df.filter(F.col("playerRole") == "Targeted Receiver").count() > 0


def test_2025_schema_side_alias(spark, tmp_path):
    """The 2025 schema's playerSide column resolves a legacy `team` header —
    alias order exercised on a synthetic frame (no real 2025 fixture ships
    with the reference)."""
    from gridiron_spark.schema.normalize import normalize
    from gridiron_spark.schema.registry import TableSchema

    schema = TableSchema.load(CONFIGS / "bdb-2025.yaml")
    raw = spark.createDataFrame(
        [(2025090100, 1, 101, 1, "left", 1.0, 2.0, 0.5, 0.1, 90.0, 45.0, "home", "QB")],
        "game_id long, play_id int, nfl_id int, frame_id int, play_direction string,"
        "x double, y double, s double, a double, o double, dir double,"
        "team string, player_position string",
    )
    out = normalize(raw, schema)
    row = out.first()
    assert row.playerSide == "home"
    assert row.position == "QB"
    assert row.gameId == 2025090100


def test_range_check_nulls_out_of_range(spark):
    """Declared min/max (the unsigned-widening contract): a value outside
    [0,255] on a UInt8-derived column nulls out instead of wrapping."""
    from gridiron_spark.schema.normalize import normalize
    from gridiron_spark.schema.registry import TableSchema

    schema = TableSchema.from_dict(
        {
            "table": "t",
            "columns": {
                "v": {"type": "short", "aliases": [], "nullable": True,
                      "min": 0, "max": 255},
            },
        }
    )
    raw = spark.createDataFrame([(300,), (255,), (-1,), (0,)], "v int")
    vals = [r.v for r in normalize(raw, schema).collect()]
    assert vals.count(None) == 2 and 255 in vals and 0 in vals


def test_2018_animate_cli_on_real_lake(spark, lake_2018, capsys):
    """The dashboard data layer against REAL competition tracking rows:
    side split resolves home/away/football from the actual team column
    (ball rows carry team='football' + null nflId in the 2018 file)."""
    from gridiron_spark.cli import main

    lake, _ = lake_2018
    pool = Pool(spark, lake)
    game = pool.games()[0]
    play = pool.plays(game)[0]
    rc = main(
        ["animate", "--pool", str(lake), "--game", str(game), "--play", str(play)],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert f"game={game} play={play}" in out
    # a real play has both squads and the ball on the field
    for part in ("offense=", "defense=", "ball="):
        n = int(out.split(part)[1].split()[0])
        assert n > 0, f"{part} empty in: {out}"


@pytest.fixture(scope="module")
def mixed_lake(spark, tmp_path_factory):
    """Both real fixtures ingested into ONE pool under their own schemas —
    the reference's actual multi-season heterogeneity."""
    lake = tmp_path_factory.mktemp("mixed_lake")
    LakeIngestor(spark, CONFIGS / "bdb-2018.yaml", lake).ingest(str(REF_2018))
    LakeIngestor(spark, CONFIGS / "bdb-2026.yaml", lake).ingest(str(REF_2023))
    return str(lake)


def test_mixed_lake_unified_scan(spark, mixed_lake):
    """scan_unified must present the superset schema with widened common
    types and keep every row — a plain scan of this lake silently adopts
    one footprint and mergeSchema throws CANNOT_MERGE_SCHEMAS (Int16 vs
    Int32 frameId), both verified failure modes."""
    df = Pool(spark, mixed_lake).scan_unified()
    dt = dict(df.dtypes)
    assert df.count() == 21403 + 8699
    # widened: 2018 frameId int vs 2023 smallint -> int
    assert dt["frameId"] == "int"
    # superset: columns exclusive to each season both present
    assert "route" in dt  # 2018-only
    assert "playerWeight" in dt  # 2023-only
    # null fill on the missing side
    n2018 = df.filter((F.col("season") == 2018) & F.col("playerWeight").isNotNull()).count()
    n2023 = df.filter((F.col("season") == 2023) & F.col("playerWeight").isNotNull()).count()
    assert n2018 == 0 and n2023 > 0


def test_mixed_lake_season_pruning(spark, mixed_lake):
    """A season filter through the Union must still prune to one subtree's
    rows (partition columns survive the per-branch basePath reads)."""
    df = Pool(spark, mixed_lake).scan_unified()
    assert df.filter(F.col("season") == 2018).count() == 21403
    assert df.filter(F.col("season") == 2023).count() == 8699
    plan = (
        df.filter(F.col("season") == 2018)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the 2023 branch must be pruned at the source: its scan reads 0 files
    # (partition filter on season), visible as a pushed partition filter
    assert "season" in plan


def test_diagnose_flags_heterogeneous_lake(spark, mixed_lake, capsys):
    """The diagnose surface must warn when a plain scan would misrepresent
    the lake (column loss / type drift across seasons)."""
    import argparse

    from gridiron_spark.cli import cmd_diagnose

    rc = cmd_diagnose(argparse.Namespace(pool=mixed_lake), spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "heterogeneous lake" in out
    assert "scan_unified" in out


def test_2018_play_figure_structure(spark, lake_2018, tmp_path):
    """Dashboard rendering parity on the REAL 2018 fixture (reference
    app/main.py:118-239): the figure must carry one ghost trace per player
    plus a ball ghost, exactly three animated marker traces, one animation
    frame per tracking frame each re-targeting only the animated traces,
    and the play/pause + slider controls."""
    from gridiron_spark.operators.features import side_split
    from gridiron_spark.viz import figure_html, play_figure

    pool = Pool(spark, lake_2018[0])
    game = pool.games()[0]
    play_id = pool.plays(game)[0]
    play = pool.fetch_play(game, play_id)
    labeled = side_split(play)

    n_players = (
        labeled.filter(F.col("nflId").isNotNull())
        .select("nflId").distinct().count()
    )
    n_frames = labeled.select("frameId").distinct().count()

    fig = play_figure(labeled)
    # traces: players ghosts + 1 ball ghost + 3 animated (off/def/ball)
    assert len(fig["data"]) == n_players + 1 + 3
    assert [t.get("name") for t in fig["data"][-3:]] == [
        "Offense", "Defense", "Ball"
    ]
    assert len(fig["frames"]) == n_frames
    anim_idx = list(range(len(fig["data"]) - 3, len(fig["data"])))
    assert all(f["traces"] == anim_idx for f in fig["frames"])
    assert all(len(f["data"]) == 3 for f in fig["frames"])
    # ghosts are static lines that skip hover
    for t in fig["data"][: n_players + 1]:
        assert t["mode"] == "lines" and t["hoverinfo"] == "skip"
    # controls: play/pause buttons + one slider step per frame
    buttons = fig["layout"]["updatemenus"][0]["buttons"]
    assert [b["label"] for b in buttons] == ["▶ Play", "⏸ Pause"]
    assert len(fig["layout"]["sliders"][0]["steps"]) == n_frames
    # field layer: pitch rect + 10 yard lines
    assert len(fig["layout"]["shapes"]) == 11
    # figure JSON must be serializable and the HTML must embed it verbatim
    html = figure_html(fig)
    assert '"frames":' in html and "Plotly.addFrames" in html


def test_2018_animate_cli_html(spark, lake_2018, tmp_path, capsys):
    """--html writes a standalone dashboard document for the play."""
    import json as _json

    from gridiron_spark.cli import main

    lake, _ = lake_2018
    pool = Pool(spark, lake)
    game = pool.games()[0]
    play = pool.plays(game)[0]
    out = tmp_path / "play.html"
    rc = main(
        ["animate", "--pool", str(lake), "--game", str(game),
         "--play", str(play), "--html", str(out)],
        spark=spark,
    )
    assert rc == 0
    txt = out.read_text()
    assert txt.startswith("<!DOCTYPE html>")
    # the embedded figure is one parseable JSON object
    fig_json = txt.split("const fig = ", 1)[1].split(";\nPlotly.newPlot", 1)[0]
    fig = _json.loads(fig_json)
    assert set(fig) == {"data", "layout", "frames"}
    assert "wrote dashboard figure" in capsys.readouterr().out
