"""Per-assembly HTML status page (HTML.pm equivalent).

The reference builds per-phase HTML dashboards with gnuplot figures
(/root/reference/src/pipelines/canu/HTML.pm:909, builders :95-508).
Here: one self-contained page from the persistent Report, with the
reference's ASCII-histogram style (Gatekeeper.pm:360-470, Meryl.pm:61-215)
rendered in <pre> blocks — no external tooling.
"""

from __future__ import annotations

import html as _html
import os
import time

from .report import Report

_PHASES = [
    ("cor", "Correction"),
    ("obt", "Trimming"),
    ("utg", "Assembly"),
]

_CSS = """
body { font-family: monospace; max-width: 60em; margin: 2em auto; color: #222; }
h1 { border-bottom: 2px solid #444; }
h2 { background: #eee; padding: .2em .5em; }
pre { background: #f7f7f7; padding: .5em; overflow-x: auto; }
.meta { color: #666; }
"""


def ascii_histogram(values, width: int = 50, label: str = "") -> str:
    """canu-style horizontal ASCII histogram from a list of counts."""
    if not len(values):
        return "(empty)"
    mx = max(values) or 1
    lines = [label] if label else []
    for i, v in enumerate(values):
        bar = "*" * max(0, round(width * v / mx))
        lines.append(f"{i:>4} {v:>8} {bar}")
    return "\n".join(lines)


def build_html(work_dir: str, prefix: str) -> str:
    """Write <prefix>.html from the report; returns the path."""
    rep = Report(os.path.join(work_dir, f"{prefix}.report"))
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(prefix)} — canu_tpu</title>",
        f"<style>{_CSS}</style></head><body>",
        f"<h1>{_html.escape(prefix)}</h1>",
        f"<p class='meta'>generated {time.strftime('%Y-%m-%d %H:%M:%S')} — canu_tpu</p>",
    ]
    for tag, title in _PHASES:
        keys = sorted(k for k in rep.data if k.startswith(tag + "."))
        if not keys:
            continue
        parts.append(f"<h2>{title}</h2>")
        for k in keys:
            parts.append(f"<h3>{_html.escape(k)}</h3>")
            parts.append(f"<pre>{_html.escape(rep.data[k])}</pre>")
    other = sorted(k for k in rep.data if not any(k.startswith(t + ".") for t, _ in _PHASES))
    if other:
        parts.append("<h2>Other</h2>")
        for k in other:
            parts.append(f"<h3>{_html.escape(k)}</h3><pre>{_html.escape(rep.data[k])}</pre>")
    parts.append("</body></html>")
    path = os.path.join(work_dir, f"{prefix}.html")
    with open(path + ".WORKING", "w") as fh:
        fh.write("\n".join(parts))
    os.replace(path + ".WORKING", path)
    return path
