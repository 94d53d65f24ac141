# Sphinx configuration — counterpart of the reference's docs/conf.py +
# .readthedocs.yml setup (reference docs/conf.py, 320 LoC of RTD plumbing).
#
# Build locally:      sphinx-build -b html docs docs/_build/html
# Or via the Makefile: make -C docs html
#
# The CI environment used to develop this repo has no sphinx installed
# (zero-egress image); the config is exercised on ReadTheDocs /
# sphinx-equipped hosts. `autodoc_mock_imports` lets the API docs build
# without the heavy runtime deps.

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "equiadapt-tpu"
author = "equiadapt-tpu contributors"
copyright = "2026, equiadapt-tpu contributors"
release = "0.4.0"
version = release

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
    "myst_parser",
]

# API pages import the package; mock anything heavy or optional so docs
# build on minimal hosts (the RTD pattern the reference uses for torch)
autodoc_mock_imports = [
    "jax",
    "jaxlib",
    "flax",
    "optax",
    "orbax",
    "wandb",
    "torch",
]
autosummary_generate = True
autodoc_default_options = {
    "members": True,
    "undoc-members": True,
    "show-inheritance": True,
}
napoleon_google_docstring = True
napoleon_numpy_docstring = False

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
myst_enable_extensions = ["colon_fence", "deflist"]
master_doc = "index"
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
}

# html_theme: furo/sphinx_rtd_theme when available, alabaster otherwise
try:  # pragma: no cover - theme probing
    import sphinx_rtd_theme  # noqa: F401

    html_theme = "sphinx_rtd_theme"
except Exception:
    html_theme = "alabaster"
html_static_path = []
