"""Deterministic tracking-shaped fixture generation (FIXTURES.md contract).

Mirrors the *behavior* of the reference's generator (2 games × 5 plays ×
50 frames × 23 entities: 11 home + 11 away + ball with null nflId; seeded) and
emits multiple header flavors (camelCase / snake_case) so the normalizer's
alias resolution is exercised. Fixture scale is tiny, so plain driver-side
pandas is the right tool — no Spark job for a 11,500-row CSV.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

CAMEL = "camel"
SNAKE = "snake"

_SNAKE_RENAME = {
    "gameId": "game_id",
    "playId": "play_id",
    "nflId": "nfl_id",
    "frameId": "frame_id",
    "playDirection": "play_direction",
    "displayName": "player_name",
    "jerseyNumber": "jersey_number",
    "position": "player_position",
    "team": "player_side",
}


def tracking_frame(
    n_games: int = 2,
    plays_per_game: int = 5,
    frames_per_play: int = 50,
    seed: int = 42,
    base_game_id: int = 2023090000,
) -> pd.DataFrame:
    """One long-format tracking table: 22 players + ball per frame."""
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_games):
        game_id = base_game_id + g
        for p in range(plays_per_game):
            play_id = (p + 1) * 50
            # entities: 11 home, 11 away, ball (nflId null, team 'football')
            entities = (
                [(1001 + i, "home", f"Home Player {i}", 10 + i) for i in range(11)]
                + [(2001 + i, "away", f"Away Player {i}", 40 + i) for i in range(11)]
                + [(None, "football", None, None)]
            )
            x0 = rng.uniform(20, 80, size=len(entities))
            y0 = rng.uniform(5, 48, size=len(entities))
            vx = rng.uniform(-0.3, 0.3, size=len(entities))
            vy = rng.uniform(-0.2, 0.2, size=len(entities))
            for f in range(1, frames_per_play + 1):
                for e, (nfl_id, team, name, jersey) in enumerate(entities):
                    is_ball = nfl_id is None
                    rows.append(
                        {
                            "gameId": game_id,
                            "playId": play_id,
                            "nflId": nfl_id,
                            "frameId": f,
                            "time": f"2023-09-10T18:00:{(f - 1) % 60:02d}.{(f - 1) // 60}00Z",
                            "playDirection": "right" if p % 2 == 0 else "left",
                            "x": round(float(x0[e] + vx[e] * f), 2),
                            "y": round(float(y0[e] + vy[e] * f), 2),
                            "s": round(float(abs(vx[e]) * 10), 2),
                            "a": round(float(abs(vy[e]) * 5), 2),
                            "dis": round(float(np.hypot(vx[e], vy[e])), 2),
                            "o": None if is_ball else round(float(rng.uniform(0, 360)), 1),
                            "dir": None if is_ball else round(float(rng.uniform(0, 360)), 1),
                            "event": "pass_forward" if f == 25 else None,
                            "team": team,
                            "position": None if is_ball else ("QB" if e == 0 else "WR"),
                            "displayName": name,
                            "jerseyNumber": jersey,
                            "route": "GO" if (not is_ball and e in (2, 3)) else None,
                        }
                    )
    return pd.DataFrame(rows)


def write_tracking_csvs(
    out_dir: str | Path,
    flavors: tuple[str, ...] = (CAMEL, SNAKE),
    **kwargs,
) -> list[Path]:
    """Write one CSV per header flavor; same logical data, different spellings
    (the alias-resolution exercise). Different base_game_id per flavor so the
    files are distinct games, like ingesting two competition years."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    base = kwargs.pop("base_game_id", 2023090000)
    paths = []
    for i, flavor in enumerate(flavors):
        df = tracking_frame(base_game_id=base + 1000 * i, **kwargs)
        if flavor == SNAKE:
            df = df.rename(columns=_SNAKE_RENAME)
        p = out_dir / f"tracking_{flavor}.csv"
        df.to_csv(p, index=False)
        paths.append(p)
    return paths
