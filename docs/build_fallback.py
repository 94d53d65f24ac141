"""Sphinx-free HTML build of the docs tree (zero-egress fallback).

The reference publishes its docs through Sphinx/ReadTheDocs
(/root/reference/docs/conf.py, .readthedocs.yml); this repo ships the same
Sphinx source (docs/conf.py + MyST markdown pages). The development image
has no sphinx, so `make html` falls back to this script: python-markdown
(stdlib-adjacent, available in the image) renders every page to
`_build/html/` with a shared stylesheet and nav. Sphinx hosts still get the
full build via docs/conf.py — this fallback only exists so the docs
subsystem is end-to-end exercisable in the CI image.
"""

from __future__ import annotations

import pathlib
import re
import shutil
import sys

import markdown

DOCS = pathlib.Path(__file__).resolve().parent
ROOT = DOCS.parent

PAGES = [
    ("index.md", "Home"),
    ("architecture.md", "Architecture"),
    ("api.md", "API reference"),
    ("migration.md", "Migration guide"),
    ("autoapi.md", "Auto API"),
    ("benchmarking.md", "Benchmarking"),
    ("roadmap.md", "Roadmap"),
]
# repo-root pages folded into the site so ../README.md style links resolve
ROOT_PAGES = [("README.md", "README"), ("DEVIATIONS.md", "Deviations"),
              ("CHANGELOG.md", "Changelog")]

STYLE = """
body { font-family: -apple-system, 'Segoe UI', sans-serif; margin: 0;
       color: #1a1a1a; }
nav { background: #1f2430; padding: 0.6rem 1.2rem; }
nav a { color: #d8dee9; margin-right: 1rem; text-decoration: none;
        font-size: 0.92rem; }
nav a:hover { color: #fff; }
main { max-width: 54rem; margin: 0 auto; padding: 1.5rem; }
pre { background: #f4f4f6; padding: 0.8rem; overflow-x: auto;
      border-radius: 6px; font-size: 0.85rem; }
code { background: #f4f4f6; padding: 0.1rem 0.25rem; border-radius: 3px; }
pre code { padding: 0; }
table { border-collapse: collapse; }
td, th { border: 1px solid #ccc; padding: 0.3rem 0.6rem; font-size: 0.9rem; }
h1, h2, h3 { line-height: 1.25; }
"""

TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title} — equiadapt-tpu</title>
<style>{style}</style></head>
<body><nav>{nav}</nav><main>{body}</main></body></html>
"""


def _strip_myst(text: str) -> str:
    # drop MyST toctree/directive blocks the plain renderer can't use
    return re.sub(r"```\{[a-z-]+\}.*?```", "", text, flags=re.S)


def _fix_links(html: str) -> str:
    html = html.replace("../README.md", "README.html")
    html = html.replace("../DEVIATIONS.md", "DEVIATIONS.html")
    html = html.replace("../CHANGELOG.md", "CHANGELOG.html")
    return re.sub(r'href="([\w.-]+)\.md(#[^"]*)?"', r'href="\1.html\2"', html)


def build(out_dir: pathlib.Path | None = None) -> pathlib.Path:
    out = out_dir or DOCS / "_build" / "html"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    all_pages = [(DOCS / n, n, t) for n, t in PAGES] + [
        (ROOT / n, n, t) for n, t in ROOT_PAGES
    ]
    nav = " ".join(
        f'<a href="{n.rsplit(".", 1)[0]}.html">{t}</a>'
        for src, n, t in all_pages if src.exists()
    )
    built = 0
    for src, name, title in all_pages:
        if not src.exists():
            continue
        body = markdown.markdown(
            _strip_myst(src.read_text()),
            extensions=["tables", "fenced_code"],
        )
        page = TEMPLATE.format(title=title, style=STYLE, nav=nav,
                               body=_fix_links(body))
        (out / (name.rsplit(".", 1)[0] + ".html")).write_text(page)
        built += 1
    print(f"built {built} pages -> {out}")
    return out


if __name__ == "__main__":
    build(pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else None)
