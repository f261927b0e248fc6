"""Minimal tile server — the engine's analog of the reference's viz app
(viz/app.js:93: serves composited overzoomed tiles over HTTP).

GET /tiles/{z}/{x}/{y}.mvt composites the configured source tiles to the
requested address via the same engine api and returns the MVT buffer
(gzip, Content-Encoding: gzip). Demo scope: source tiles load from
reference fixtures (read-only) or any .mvt paths passed on the CLI.

Usage:  python tools/serve_tiles.py [port] [src.mvt:z:x:y ...]
"""

from __future__ import annotations

import os
import re
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TILE_RE = re.compile(r"^/tiles/(\d+)/(\d+)/(\d+)\.mvt$")


def make_handler(spark, sources):
    from vtcomposite_spark import api
    from vtcomposite_spark.operators.composite import CompositeRequestError

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            m = _TILE_RE.match(self.path)
            if not m:
                self.send_response(404)
                self.end_headers()
                return
            z, x, y = (int(g) for g in m.groups())
            tiles = [
                {"buffer": buf, "z": sz, "x": sx, "y": sy}
                for (buf, sz, sx, sy) in sources
                if sz <= z and (x >> (z - sz)) == sx and (y >> (z - sz)) == sy
            ]
            if not tiles:
                self.send_response(204)
                self.end_headers()
                return
            try:
                out = api.composite(tiles, {"z": z, "x": x, "y": y},
                                    {"compress": True}, spark=spark)
            except CompositeRequestError as e:
                self.send_response(400)
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/vnd.mapbox-vector-tile")
            if out[:2] == b"\x1f\x8b":
                self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *args):  # quiet
            pass

    return Handler


def default_sources():
    fx = "/root/reference/test/fixtures"
    out = []
    for name, z, x, y in [("four-points-quadrants.mvt", 0, 0, 0),
                          ("simple-line.mvt", 0, 0, 0)]:
        p = os.path.join(fx, name)
        if os.path.exists(p):
            with open(p, "rb") as f:
                out.append((f.read(), z, x, y))
    return out


def main() -> None:
    from vtcomposite_spark.schema import get_spark

    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8080
    sources = []
    for spec in sys.argv[2:]:
        path, z, x, y = spec.rsplit(":", 3)
        with open(path, "rb") as f:
            sources.append((f.read(), int(z), int(x), int(y)))
    if not sources:
        sources = default_sources()
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    server = HTTPServer(("127.0.0.1", port), make_handler(spark, sources))
    print(f"serving {len(sources)} source tiles on http://127.0.0.1:{port}"
          "/tiles/{z}/{x}/{y}.mvt")
    server.serve_forever()


if __name__ == "__main__":
    main()
