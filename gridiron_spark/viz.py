"""Dashboard rendering layer: the reference app's Plotly play animation.

The reference renders one play as an animated Plotly figure inside a
Streamlit shell (reference app/main.py:118-239): a static field layer,
per-player faint "ghost" full-path traces, three animated marker traces
(offense / defense / ball), one animation frame per tracking frame, a
play/pause button pair, and a frame slider. This module reproduces that
figure as a plain JSON-able dict — Plotly's figure schema is public JSON,
so no plotly dependency is needed to *build* it, only to view it; the
emitted HTML pulls plotly.js from the CDN exactly like any exported figure.

Driver-side assembly is the correct boundary here, as in the reference: a
single play is a few thousand rows (one game's play, not the lake), and the
engine-side work — partition-pruned fetch, side labeling, header stats — is
done by Pool.fetch_play / side_split / animate_stats before this module
ever sees rows.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

# reference app/main.py:140-144
COLOR_HOME = "#00BFFF"
COLOR_AWAY = "#FF4500"
COLOR_BALL = "#FFD700"

_FIELD_LEN, _FIELD_WID = 120, 53.3  # app/main.py:124


def _field_shapes() -> list[dict[str, Any]]:
    """Static field layer: pitch rect + yard lines (app/main.py:123-131)."""
    shapes: list[dict[str, Any]] = [
        {
            "type": "rect", "x0": 0, "y0": 0, "x1": _FIELD_LEN, "y1": _FIELD_WID,
            "line": {"color": "rgba(255,255,255,0.8)", "width": 2},
            "fillcolor": "#263c28", "layer": "below",
        }
    ]
    for i in range(10, 110, 10):
        shapes.append(
            {
                "type": "line", "x0": i, "y0": 0, "x1": i, "y1": _FIELD_WID,
                "line": {"color": "rgba(255,255,255,0.3)", "width": 1},
                "layer": "below",
            }
        )
    return shapes


def _scatter(x, y, **kw) -> dict[str, Any]:
    d = {"type": "scatter", "x": list(x), "y": list(y)}
    d.update(kw)
    return d


def play_figure(labeled: DataFrame) -> dict[str, Any]:
    """Build the reference dashboard's animated play figure (app/main.py:
    118-239) from a side-labeled single-play DataFrame (side_split output:
    columns frameId, nflId, x, y, side).

    Returns a Plotly figure dict: ``{"data": [...], "layout": {...},
    "frames": [...]}``. Trace order matches the reference exactly — ghosts
    first (static, hover-skipped), then the animated offense/defense[/ball]
    marker traces; each animation frame re-targets only those last traces
    via its ``traces`` index list (app/main.py:186-196).
    """
    rows = (
        labeled.select("frameId", "nflId", "x", "y", "side")
        .orderBy("frameId", "nflId")
        .collect()
    )
    if not rows:
        raise ValueError("play_figure: empty play")

    by_side: dict[str, list] = {"offense": [], "defense": [], "ball": []}
    for r in rows:
        by_side.setdefault(r["side"], []).append(r)
    home, away, ball = by_side["offense"], by_side["defense"], by_side["ball"]
    has_ball = bool(ball)
    frames = sorted({r["frameId"] for r in rows})

    data: list[dict[str, Any]] = []

    # 2. ghost traces: one faint full-path line per player (app/main.py:146-166)
    def add_ghosts(side_rows, color):
        pids = sorted({r["nflId"] for r in side_rows if r["nflId"] is not None})
        for pid in pids:
            path = [r for r in side_rows if r["nflId"] == pid]
            data.append(
                _scatter(
                    (r["x"] for r in path), (r["y"] for r in path),
                    mode="lines", line={"color": color, "width": 2},
                    opacity=0.15, showlegend=False, hoverinfo="skip",
                )
            )

    add_ghosts(home, COLOR_HOME)
    add_ghosts(away, COLOR_AWAY)
    if has_ball:
        data.append(
            _scatter(
                (r["x"] for r in ball), (r["y"] for r in ball),
                mode="lines",
                line={"color": COLOR_BALL, "width": 2, "dash": "dot"},
                opacity=0.3, showlegend=False, hoverinfo="skip",
            )
        )

    # 3. animated traces, initialized at the first frame (app/main.py:170-183)
    def at_frame(side_rows, f):
        pts = [r for r in side_rows if r["frameId"] == f]
        return [r["x"] for r in pts], [r["y"] for r in pts]

    h_x, h_y = at_frame(home, frames[0])
    a_x, a_y = at_frame(away, frames[0])
    data.append(
        _scatter(
            h_x, h_y, mode="markers", name="Offense",
            marker={"size": 12, "color": COLOR_HOME,
                    "line": {"color": "white", "width": 1}},
        )
    )
    data.append(
        _scatter(
            a_x, a_y, mode="markers", name="Defense",
            marker={"size": 12, "color": COLOR_AWAY,
                    "line": {"color": "white", "width": 1}},
        )
    )
    if has_ball:
        b_x, b_y = at_frame(ball, frames[0])
        data.append(
            _scatter(
                b_x, b_y, mode="markers", name="Ball",
                marker={"size": 8, "color": COLOR_BALL},
            )
        )

    # 4. animation frames update ONLY the trailing animated traces
    # (app/main.py:186-196)
    n_anim = 3 if has_ball else 2
    anim_idx = list(range(len(data) - n_anim, len(data)))
    fig_frames = []
    for f in frames:
        h_x, h_y = at_frame(home, f)
        a_x, a_y = at_frame(away, f)
        traces = [_scatter(h_x, h_y), _scatter(a_x, a_y)]
        if has_ball:
            b_x, b_y = at_frame(ball, f)
            traces.append(_scatter(b_x, b_y))
        fig_frames.append({"data": traces, "name": str(f), "traces": anim_idx})

    # 5. layout: field, controls, slider (app/main.py:199-238)
    layout = {
        "height": 600,
        "paper_bgcolor": "black",
        "plot_bgcolor": "black",
        "font": {"color": "white"},
        "shapes": _field_shapes(),
        "xaxis": {"range": [-5, 125], "showgrid": False, "visible": False,
                  "fixedrange": True},
        "yaxis": {"range": [-5, 58], "showgrid": False, "visible": False,
                  "fixedrange": True},
        "legend": {"orientation": "h", "y": 1.05, "x": 0.5,
                   "xanchor": "center"},
        "hovermode": "closest",
        "updatemenus": [
            {
                "type": "buttons", "showactive": False,
                "y": 0, "x": 0, "xanchor": "left",
                "pad": {"t": 50, "r": 10},
                "buttons": [
                    {
                        "label": "▶ Play", "method": "animate",
                        "args": [None, {"frame": {"duration": 100,
                                                  "redraw": False},
                                        "fromcurrent": True}],
                    },
                    {
                        "label": "⏸ Pause", "method": "animate",
                        "args": [[None], {"frame": {"duration": 0,
                                                    "redraw": False},
                                          "mode": "immediate",
                                          "transition": {"duration": 0}}],
                    },
                ],
            }
        ],
        "sliders": [
            {
                "steps": [
                    {
                        "method": "animate",
                        "args": [[str(f)], {"mode": "immediate",
                                            "frame": {"duration": 0,
                                                      "redraw": False},
                                            "transition": {"duration": 0}}],
                        "label": str(f),
                    }
                    for f in frames
                ],
                "transition": {"duration": 0},
                "x": 0.1, "len": 0.9, "y": 0,
                "currentvalue": {"font": {"size": 15}, "prefix": "Frame: ",
                                 "visible": True, "xanchor": "right"},
                "font": {"color": "white"},
            }
        ],
    }
    return {"data": data, "layout": layout, "frames": fig_frames}


_HTML_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>{title}</title>
<script src="https://cdn.plot.ly/plotly-2.35.2.min.js" charset="utf-8"></script>
<style>body {{ margin: 0; background: black; }}</style>
</head>
<body>
<div id="play" style="width:100%;height:600px;"></div>
<script>
const fig = {fig_json};
Plotly.newPlot("play", fig.data, fig.layout).then(() => {{
  Plotly.addFrames("play", fig.frames);
}});
</script>
</body>
</html>
"""


def figure_html(fig: dict[str, Any], title: str = "gridiron play") -> str:
    """Standalone HTML document for a play figure — the headless stand-in
    for the reference's Streamlit `st.plotly_chart` embed (app/main.py:239):
    same figure JSON, plotly.js from the CDN, no Python-side plotly import."""
    return _HTML_TEMPLATE.format(title=title, fig_json=json.dumps(fig))
