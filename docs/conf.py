# Sphinx configuration (counterpart of the reference's docs/conf.py +
# .readthedocs.yml setup). Build with: sphinx-build docs docs/_build
project = "equiadapt-tpu"
author = "equiadapt-tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"
