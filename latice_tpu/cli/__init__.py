"""Command-line entry points, installable as console scripts.

``latice-train`` / ``latice-index`` / ``latice-serve`` map to the ``main``
functions here (pyproject ``[project.scripts]``); the repo-root ``train.py``,
``index.py`` and ``serve.py`` are thin shims over the same modules, keeping
the reference's ``python train.py ...`` invocation style working.
"""

__all__ = ["index", "serve", "train"]
