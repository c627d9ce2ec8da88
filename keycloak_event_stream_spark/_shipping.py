"""Worker-code shipping policy: pickle-by-value for UDF/source modules.

Spark serializes Python worker-side code (UDFs, applyInPandas /
mapInPandas functions, Python DataSource classes) with cloudpickle,
which pickles module-level functions and classes from an importable
module BY REFERENCE — the executor-side worker then has to import the
defining module. That silently couples every such operator to the
workers' ``sys.path``: it works while the driver process happens to
run with this repo as its cwd (local-mode workers inherit it) or the
package is deployed to every executor, and breaks with
``ModuleNotFoundError`` the moment a driver embeds the library from
anywhere else — the same hazard class as round 6's
``s_stateful_profile`` module-reference closure, found by running the
driver simulation from ``/tmp`` (five window queries failed:
applyInPandas' module-level aggregator and the four Python-DataSource
paths).

The fix is cloudpickle's own escape hatch:
``register_pickle_by_value(module)`` makes everything the module
defines serialize BY VALUE, so the bytes that reach the worker are
self-contained. Every module that ships code to Python workers calls
:func:`ship_module_by_value` on itself at import time — and since
round 8 that set is not a hand-maintained list but DISCOVERED by
:func:`discover_worker_modules` (a source scan for worker-API call
tokens) and enforced by ``tests/test_shipping.py``, because the manual
list is exactly how round 7 missed ``operators.relational``'s
module-level ``applyInPandas`` function. Cost: a few KB
per closure instead of a dotted name — irrelevant against Arrow batch
traffic. Scale note: this is also the right call on a real cluster,
where "pip install the analytics repo on 1000 executors before every
query change" is exactly the deployment coupling a library should not
demand.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path
from types import ModuleType

#: Call-shaped tokens that mean "this module's source hands Python
#: callables/classes to Spark workers". Deliberately broad (docstring
#: mentions of a call form can match) — over-registering a module for
#: by-value shipping is free; missing one is the ModuleNotFoundError
#: class this file exists to kill.
_WORKER_API_TOKENS = re.compile(
    r"\.applyInPandas\(|\.mapInPandas\(|\.applyInPandasWithState\(|"
    r"\.transformWithStateInPandas\(|\.mapInArrow\(|pandas_udf\(|"
    r"@udtf|\budtf\(|\budf\(|\.foreach\(|\(DataSource\)|"
    r"DataSourceReader|\.mapPartitions\("
)


def discover_worker_modules() -> list[str]:
    """Scan the package source for modules whose text matches a worker-
    API call token. The shipping test requires every discovered module
    to be registered for by-value pickling — the manual-list failure
    mode (round 7: ``operators.relational`` defined a module-level
    ``applyInPandas`` function but was never listed) cannot recur
    because the list is derived, not maintained."""
    pkg_root = Path(__file__).resolve().parent
    found: list[str] = []
    for path in sorted(pkg_root.rglob("*.py")):
        if path.name == "_shipping.py":
            continue  # defines the policy, ships no worker code
        if _WORKER_API_TOKENS.search(path.read_text(encoding="utf-8")):
            rel = path.relative_to(pkg_root).with_suffix("")
            found.append("keycloak_event_stream_spark." + ".".join(rel.parts))
    return found


def ship_module_by_value(module: ModuleType | str) -> bool:
    """Register ``module`` (object or name) for cloudpickle by-value
    serialization. Returns True when registered; False when the
    vendored cloudpickle lacks the API (old pyspark) — worker-side
    imports then still work wherever the package IS importable, which
    is the pre-existing behavior, not a new failure."""
    if isinstance(module, str):
        module = sys.modules[module]
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(module)
        return True
    except Exception:
        return False
