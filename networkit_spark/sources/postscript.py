"""PostscriptWriter — EPS rendering of a laid-out graph.

Reference (networkit/cpp/viz/PostscriptWriter.cpp:1-169):
- 24-color cyclic cluster palette (fromCyclicRotation, :20-33);
- bounding box: points scaled per-dimension onto a 1020×1020 canvas,
  scale = (size − 2·border)/(max − min) with the default-constructed
  border (0, 0) (:39-47, hpp:60-61);
- header/macros (:51-80), fixed 3-decimal float formatting (:134-135);
- per-edge line `p x1 y1 m x2 y2 l s` colored by the endpoints' shared
  cluster (grey `0.80 0.80 0.80 c 1.0 w` across clusters, :88-117);
  torus mode wraps deltas beyond ±500 by ±1000 (:102-110);
- per-node dot `p x y 2.000 0.00 360.00 a s` in the cluster color
  (black when unclustered, :120-130);
- write() without a partition uses makeOneClustering — every node in
  cluster 0 (:159-167).

Rendering is a terminal, human-scale sink (like the GML-family
writers): coordinates and edges are collected and written driver-side
in deterministic canonical (src, dst) order; the distributed engine's
job is producing the layout (operators/layout.pivot_mds) and the
partition, not the EPS bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph

_PALETTE = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]

_SIZE = 1020.0


def _color(index: int) -> str:
    r, g, b = _PALETTE[index % len(_PALETTE)]
    return f"{r:.3f} {g:.3f} {b:.3f} c "


def write_postscript(
    graph: Graph,
    coordinates: DataFrame,
    path: str,
    clustering: DataFrame | None = None,
    torus: bool = False,
) -> None:
    """Write the graph as EPS. `coordinates` = (id, x, y);
    `clustering` = (id, label) or None for the reference's
    one-clustering default (every node cluster 0)."""
    pts = {
        r["id"]: (float(r["x"]), float(r["y"]))
        for r in coordinates.select("id", "x", "y").collect()
    }
    if not pts:
        raise ValueError("empty coordinate table")
    if clustering is None:
        labels: dict[int, int | None] = {u: 0 for u in pts}
    else:
        labels = {u: None for u in pts}
        labels.update(
            (r["id"], int(r["label"]))
            for r in clustering.select("id", "label").collect()
        )

    xs = [p[0] for p in pts.values()]
    ys = [p[1] for p in pts.values()]
    mn = (min(xs), min(ys))
    rng = (max(xs) - mn[0], max(ys) - mn[1])
    scale = tuple(_SIZE / d if d > 0 else 1.0 for d in rng)

    def adj(u: int) -> tuple[float, float]:
        p = pts[u]
        return ((p[0] - mn[0]) * scale[0], (p[1] - mn[1]) * scale[1])

    lines = []
    if torus:
        lines.append("%!PS-Adobe-3.0 EPSF-3.0")
    else:
        lines.append("%!PS-Adobe-1.0")
    lines += [
        "%%Title: NetworKit visualization",
        f"%%BoundingBox: 0.000 0.000 {_SIZE:.3f} {_SIZE:.3f}",
        "%%EndComments",
    ]
    if not torus:
        lines += ["%%EndProlog", "gsave"]
    lines += [
        "/p {newpath} bind def",
        "/m {moveto} bind def",
        "/r {rmoveto} bind def",
        "/k {rlineto} bind def",
        "/l {lineto} bind def",
        "/n {rlineto} bind def",
        "/c {setrgbcolor} bind def",
        "/s {stroke} bind def",
        "/w {setlinewidth} bind def",
        "/h {show} bind def",
        "/a {arc closepath fill} bind def",
        "/b {closepath eofill} bind def",
        "0.000 0.000 0.000 c",
    ]

    und = (
        graph.edges.select("src", "dst") if graph.directed
        else graph.edges.filter(F.col("src") <= F.col("dst"))
        .select("src", "dst")
    )
    for e in und.distinct().orderBy("src", "dst").collect():
        u, v = e["src"], e["dst"]
        if u not in pts or v not in pts:
            raise ValueError(f"edge endpoint {u}-{v} has no coordinate")
        lu, lv = labels.get(u), labels.get(v)
        if lu is not None and lu == lv:
            pre = _color(lu)
        else:
            pre = "0.80 0.80 0.80 c 1.0 w "
        (x1, y1), (x2, y2) = adj(u), adj(v)
        if torus:
            dx, dy = x2 - x1, y2 - y1
            dx += -1000.0 if dx > 500.0 else (1000.0 if dx < -500.0 else 0.0)
            dy += -1000.0 if dy > 500.0 else (1000.0 if dy < -500.0 else 0.0)
            x2, y2 = x1 + dx, y1 + dy
        lines.append(
            f"{pre}p {x1:.3f} {y1:.3f} m {x2:.3f} {y2:.3f} l s"
        )

    for u in sorted(pts):
        lu = labels.get(u)
        pre = _color(lu) if lu is not None else "0.000 0.000 0.000 c "
        x, y = adj(u)
        lines.append(f"{pre}p {x:.3f} {y:.3f} 2.000 0.00 360.00 a s")

    if not torus:
        lines.append("grestore")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
