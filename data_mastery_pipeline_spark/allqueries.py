"""One canonical query-module registrar.

Mechanism, not checklist: ``bench.py``, ``tools/gen_plans.py`` and
``__spark_entry__.py`` each carried their own copy of the
"import every queries* module" list, and the copies drifted twice —
round 7's first bench silently dropped the 6 new ``queries_gov``
entries, and round 8's quiet re-bench died loudly (by design) when
``queries_stats`` was missing from bench.py's copy while the other
three had it. ``register_all()`` discovers ``queries*.py`` modules
from the package path itself, so a new query module registers
everywhere the moment the file exists — there is no list to forget.
"""

from __future__ import annotations

import importlib
import pkgutil


def register_all() -> None:
    """Import every ``data_mastery_pipeline_spark.queries*`` module so
    their ``@query`` decorators populate ``registry.QUERIES`` /
    ``registry.ORACLES``. Idempotent (module cache)."""
    import data_mastery_pipeline_spark as pkg

    for mod in pkgutil.iter_modules(pkg.__path__):
        if mod.name == "queries" or mod.name.startswith("queries_"):
            importlib.import_module(
                f"data_mastery_pipeline_spark.{mod.name}"
            )
