"""Interactive dashboard shell: ``python -m gridiron_spark serve --pool …``.

The reference serves its dashboard through Streamlit (reference
app/main.py:27-60 — an ``@st.cache_resource`` engine, game/play selectboxes,
then the animated figure; launched by Makefile:44-45). Streamlit is not in
this container, so this is the same three-piece shell on the standard
library's threading HTTP server:

- the engine resource is built ONCE per process (one SparkSession + Pool,
  the cache_resource analog) and shared across requests;
- ``/api/games`` and ``/api/plays?game=`` feed the two dropdowns (the
  selectbox analog — driver-side key lists, the reference's own access
  pattern at app/main.py:33-41);
- ``/fig?game=&play=`` returns the full animated figure page from the
  existing ``animate --html`` data path (viz.play_figure → figure_html),
  memoized per (game, play) so re-selecting a play never re-runs the query.

Everything here is a thin adapter over the library; no engine behavior
lives in the serving layer, and the driver never touches it.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>gridiron dashboard</title>
<style>
 body { font-family: sans-serif; margin: 1.5rem; }
 select { font-size: 1rem; margin-right: 1rem; }
 iframe { border: 1px solid #ccc; width: 100%; height: 640px; margin-top: 1rem; }
</style></head>
<body>
<h2>gridiron play dashboard</h2>
<label>game <select id="game"></select></label>
<label>play <select id="play"></select></label>
<iframe id="fig" title="play animation"></iframe>
<script>
const $ = id => document.getElementById(id);
async function jget(url) { const r = await fetch(url); return r.json(); }
function fill(sel, values) {
  sel.innerHTML = "";
  for (const v of values) {
    const o = document.createElement("option"); o.value = v; o.textContent = v;
    sel.appendChild(o);
  }
}
async function loadPlays() {
  fill($("play"), await jget("/api/plays?game=" + $("game").value));
  showFig();
}
function showFig() {
  $("fig").src = "/fig?game=" + $("game").value + "&play=" + $("play").value;
}
$("game").addEventListener("change", loadPlays);
$("play").addEventListener("change", showFig);
(async () => { fill($("game"), await jget("/api/games")); await loadPlays(); })();
</script>
</body></html>
"""


class _Engine:
    """The cache_resource analog: one Pool per process, memoized listings
    and figures (the listings are the reference's own driver-side key
    fetches, bounded; figures are one play each by design)."""

    def __init__(self, spark, pool_path: str):
        from gridiron_spark.pool import Pool

        self.pool = Pool(spark, pool_path)
        self._lock = threading.Lock()
        self._games: list[int] | None = None
        self._plays: dict[int, list[int]] = {}
        self._figs: dict[tuple[int, int], str] = {}

    def games(self) -> list[int]:
        with self._lock:
            if self._games is None:
                self._games = self.pool.games()
            return self._games

    def plays(self, game: int) -> list[int]:
        with self._lock:
            if game not in self._plays:
                self._plays[game] = self.pool.plays(game)
            return self._plays[game]

    def figure_page(self, game: int, play: int) -> str:
        key = (game, play)
        with self._lock:
            if key in self._figs:
                return self._figs[key]
        from gridiron_spark.operators.features import side_split
        from gridiron_spark.viz import figure_html, play_figure

        labeled = side_split(self.pool.fetch_play(game, play))
        page = figure_html(
            play_figure(labeled), title=f"game {game} play {play}"
        )
        with self._lock:
            self._figs[key] = page
            return page


def _make_handler(engine: _Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet server
            pass

        def _send(self, body: str, ctype: str, code: int = 200) -> None:
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", f"{ctype}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/":
                    self._send(_PAGE, "text/html")
                elif url.path == "/api/games":
                    self._send(json.dumps(engine.games()), "application/json")
                elif url.path == "/api/plays":
                    plays = engine.plays(int(q["game"]))
                    self._send(json.dumps(plays), "application/json")
                elif url.path == "/fig":
                    page = engine.figure_page(int(q["game"]), int(q["play"]))
                    self._send(page, "text/html")
                else:
                    self._send("not found", "text/plain", 404)
            except (KeyError, ValueError) as exc:
                self._send(f"bad request: {exc}", "text/plain", 400)

    return Handler


def make_server(spark, pool_path: str, port: int = 8501) -> ThreadingHTTPServer:
    """Build (don't start) the server — separable for tests."""
    return ThreadingHTTPServer(
        ("127.0.0.1", port), _make_handler(_Engine(spark, pool_path))
    )


def serve(spark, pool_path: str, port: int = 8501) -> int:
    srv = make_server(spark, pool_path, port)
    host, actual_port = srv.server_address[:2]
    print(f"serving dashboard on http://{host}:{actual_port} (Ctrl-C to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0
