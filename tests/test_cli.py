"""CLI subcommands driven in-process (shared test session; each command is a
thin adapter over tested library code — these tests pin the wiring and exit
codes, plus a full ingest→diagnose→sample→export round trip on fixtures)."""

from __future__ import annotations

import pytest

from gridiron_spark.cli import main
from gridiron_spark.fixtures import write_tracking_csvs


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_lake")
    csv_dir = root / "csv"
    write_tracking_csvs(csv_dir, n_games=2, plays_per_game=3, frames_per_play=5, seed=7)
    schema = "gridiron_spark/configs/tracking.yaml"
    pool = root / "pool"
    rc = main(
        [
            "ingest",
            "--input",
            f"{csv_dir}/*.csv",
            "--schema",
            schema,
            "--output",
            str(pool),
        ],
        spark=spark,
    )
    assert rc == 0
    return pool


def test_ingest_dry_run(spark, lake, tmp_path, capsys):
    csv_dir = tmp_path / "csv2"
    write_tracking_csvs(csv_dir, n_games=1, plays_per_game=2, frames_per_play=4, seed=9)
    rc = main(
        [
            "ingest",
            "--input",
            f"{csv_dir}/*.csv",
            "--schema",
            "gridiron_spark/configs/tracking.yaml",
            "--output",
            str(tmp_path / "nope"),
            "--dry-run",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "DRY RUN" in capsys.readouterr().out
    assert not (tmp_path / "nope").exists()  # dry run writes nothing


def test_diagnose_ok_and_missing(spark, lake, tmp_path, capsys):
    assert main(["diagnose", "--pool", str(lake)], spark=spark) == 0
    out = capsys.readouterr().out
    assert "schema:" in out and "probe: OK" in out
    assert main(["diagnose", "--pool", str(tmp_path / "missing")], spark=spark) == 1


def test_sample_with_filter(spark, lake, capsys):
    rc = main(
        ["sample", "--pool", str(lake), "--n", "2", "--seed", "1",
         "--filter", "frameId >= 1"],
        spark=spark,
    )
    assert rc == 0
    assert "sampled 2 plays" in capsys.readouterr().out


def test_export_roundtrip(spark, lake, tmp_path):
    out = tmp_path / "dump"
    rc = main(
        ["export", "--pool", str(lake), "--output", str(out), "--n", "2"],
        spark=spark,
    )
    assert rc == 0
    back = spark.read.option("header", True).csv(str(out))
    assert back.count() > 0
    assert {"gameId", "playId", "frameId"} <= set(back.columns)


def test_animate_play_data(spark, lake, tmp_path, capsys):
    """The dashboard data layer end-to-end: stats line + labeled CSV frames
    with the offense/defense/ball split (reference app/main.py:74-107)."""
    from gridiron_spark.pool import Pool

    pool = Pool(spark, lake)
    game = pool.games()[0]
    play = pool.plays(game)[0]
    out = tmp_path / "anim"
    rc = main(
        ["animate", "--pool", str(lake), "--game", str(game),
         "--play", str(play), "--output", str(out)],
        spark=spark,
    )
    assert rc == 0
    stdout = capsys.readouterr().out
    assert f"game={game} play={play}" in stdout
    assert "players=22" in stdout and "ball=" in stdout
    back = spark.read.option("header", True).csv(str(out))
    assert "side" in back.columns
    sides = {r.side for r in back.select("side").distinct().collect()}
    assert sides == {"offense", "defense", "ball"}
    # every frame carries exactly 23 entities (22 players + ball)
    assert back.count() == back.select("frameId").distinct().count() * 23


def test_animate_missing_play(spark, lake, capsys):
    rc = main(
        ["animate", "--pool", str(lake), "--game", "1", "--play", "999"],
        spark=spark,
    )
    assert rc == 1
    assert "FAIL" in capsys.readouterr().out


def test_cli_compact(spark, tmp_path):
    from pathlib import Path

    from gridiron_spark.cli import main

    pool = str(tmp_path / "pool")
    base = spark.range(0, 60).selectExpr(
        "cast(2018111800 as long) gameId",
        "cast(id as int) frameId",
        "'2018' as season",
    )
    for i in range(2):
        base.filter(f"frameId % 2 = {i}").write.mode("append").partitionBy(
            "season", "gameId"
        ).parquet(pool)
    rc = main(["compact", "--pool", pool, "--sort-by", "frameId"], spark=spark)
    assert rc == 0
    files = [
        len(list(p.glob("*.parquet"))) for p in Path(pool).glob("season=*/gameId=*")
    ]
    assert files and max(files) == 1


def test_prepare_corpus_cli(spark, tmp_path, capsys):
    """prepare-corpus writes bucket_len-partitioned parquet shards whose
    rows equal the training_data_pipeline query output exactly."""
    from pathlib import Path

    from gridiron_spark.cli import main
    from gridiron_spark.queries import catalog
    from tests.conftest import SF_SMALL

    out = tmp_path / "shards"
    rc = main(
        ["prepare-corpus", "--sf-dir", SF_SMALL, "--output", str(out),
         "--shards", "2"],
        spark=spark,
    )
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    bucket_dirs = sorted(p.name for p in Path(out).glob("bucket_len=*"))
    assert bucket_dirs, "expected Hive bucket_len partitions"
    got = spark.read.parquet(str(out))
    want = catalog()["training_data_pipeline"].spark_fn(spark, SF_SMALL)
    cols = sorted(want.columns)
    assert sorted(
        tuple(r) for r in got.select(*cols).collect()
    ) == sorted(tuple(r) for r in want.select(*cols).collect())


def test_serve_dashboard_endpoints(spark, lake):
    """Drive the serve shell end-to-end over HTTP: dropdown feeds
    (/api/games, /api/plays) and the figure page, same data path as
    ``animate --html``; the memoized second fetch must be byte-identical."""
    import json
    import threading
    import urllib.request

    from gridiron_spark.serve import make_server

    srv = make_server(spark, str(lake), port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}"
                ) as r:
                    return r.status, r.read().decode()
            except urllib.error.HTTPError as e:
                return e.code, e.read().decode()

        status, body = get("/")
        assert status == 200 and "gridiron play dashboard" in body

        status, body = get("/api/games")
        games = json.loads(body)
        # >= the fixture's 2 games: earlier tests in this module may have
        # ingested more into the shared lake
        assert status == 200 and len(games) >= 2

        status, body = get(f"/api/plays?game={games[0]}")
        plays = json.loads(body)
        assert status == 200 and len(plays) >= 1

        status, fig = get(f"/fig?game={games[0]}&play={plays[0]}")
        assert status == 200
        assert "frames" in fig and "Offense" in fig and "Defense" in fig
        _, fig2 = get(f"/fig?game={games[0]}&play={plays[0]}")
        assert fig2 == fig  # memoized

        assert get("/nope")[0] == 404
        assert get("/api/plays?game=zzz")[0] == 400
    finally:
        srv.shutdown()
        srv.server_close()
