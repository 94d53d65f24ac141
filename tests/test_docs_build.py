"""The docs tree builds to HTML on sphinx-less hosts (docs/build_fallback.py).

The reference ships Sphinx/ReadTheDocs docs (reference docs/conf.py); this
repo carries the same Sphinx source plus a python-markdown fallback so the
build is exercisable in the zero-egress CI image.
"""

import pathlib
import sys

import pytest

DOCS = pathlib.Path(__file__).resolve().parents[1] / "docs"


def test_fallback_build(tmp_path):
    pytest.importorskip("markdown")
    sys.path.insert(0, str(DOCS))
    try:
        import build_fallback
    finally:
        sys.path.pop(0)
    out = build_fallback.build(tmp_path / "html")
    pages = sorted(p.name for p in out.glob("*.html"))
    # every docs/ page plus the folded-in repo-root pages
    for required in ("index.html", "architecture.html", "api.html",
                     "migration.html", "benchmarking.html", "README.html"):
        assert required in pages
    index = (out / "index.html").read_text()
    assert 'href="architecture.html"' in index  # .md links rewritten
    assert "{toctree}" not in index  # MyST directives stripped
