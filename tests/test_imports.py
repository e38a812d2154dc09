"""Fast-lane import smoke: every module under ``dynamic_asr_eval_tpu``
must import cleanly.  This keeps the fast lane (``pytest -m "not slow"``)
covering 100% of the module surface even where the functional test for a
module lives in the slow lane (torch oracles, driver end-to-end smokes)."""

import importlib
import pkgutil

import dynamic_asr_eval_tpu


def test_all_modules_import():
    pkg = dynamic_asr_eval_tpu
    failures = []
    for mod in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures.append((mod.name, repr(e)))
    assert not failures, failures
