"""Worker-code shipping policy: modules that define UDF / DataSource /
mapInPandas code must be registered for cloudpickle BY-VALUE
serialization, so Python workers never need this package importable
(the round-7 /tmp driver-simulation failure class: five window queries
threw ModuleNotFoundError when the driver process ran outside the
repo). The operational proof is the driver simulation run from /tmp;
this test pins the registration so a new worker-shipping module (or a
refactor dropping the ship_module_by_value call) fails fast."""

from __future__ import annotations

import pickle
import sys


WORKER_MODULES = [
    "keycloak_event_stream_spark.functions.udfs",
    "keycloak_event_stream_spark.sources.pushgen",
    "keycloak_event_stream_spark.sources.pysink",
    "keycloak_event_stream_spark.sources.pygen",
    "keycloak_event_stream_spark.llm.multimodal",
]


def test_worker_modules_registered_pickle_by_value():
    from pyspark import cloudpickle

    for name in WORKER_MODULES:
        __import__(name)
    registered = {
        m if isinstance(m, str) else m.__name__
        for m in cloudpickle.list_registry_pickle_by_value()
    }
    missing = [m for m in WORKER_MODULES if m not in registered]
    assert not missing, f"not shipped by value: {missing}"


def test_by_value_pickle_is_self_contained():
    """A worker-side function from a registered module must unpickle
    WITHOUT the package being importable — simulated by stripping the
    module entries and repo path before loads()."""
    from pyspark import cloudpickle

    from keycloak_event_stream_spark.functions import udfs

    blob = cloudpickle.dumps(udfs._user_stats)
    saved_modules = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k.startswith("keycloak_event_stream_spark")
    }
    saved_path = sys.path[:]
    sys.path = [p for p in sys.path if "repo" not in p]
    try:
        fn = pickle.loads(blob)
        import pandas as pd

        out = fn(pd.DataFrame({"user_id": [7, 7], "event_id": [1, 3]}))
        assert out["median_event_id"].iloc[0] == 2.0
        assert not any(
            k.startswith("keycloak_event_stream_spark") for k in sys.modules
        ), "unpickling imported the package — still by reference"
    finally:
        sys.path = saved_path
        sys.modules.update(saved_modules)


def test_shipping_helper_degrades_quietly(monkeypatch):
    """On a pyspark whose vendored cloudpickle lacks the API the helper
    must return False, not raise — by-reference shipping is the
    pre-existing behavior, not a new failure."""
    from keycloak_event_stream_spark import _shipping

    class _Stub:
        pass  # no register_pickle_by_value attribute

    monkeypatch.setitem(sys.modules, "pyspark.cloudpickle", _Stub())
    monkeypatch.setattr(
        sys.modules["pyspark"], "cloudpickle", _Stub(), raising=False
    )
    assert _shipping.ship_module_by_value("keycloak_event_stream_spark._shipping") is False
