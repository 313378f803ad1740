"""The query registry must be fully usable WITHOUT google.protobuf.

``streaming/tws.py`` (transformWithState) is gated on protobuf — absent
in this sandbox and potentially in the driver environment.  VERDICT r4
#5 asks for proof that a protobuf-less driver still gets the
applyInPandasWithState ledger row: registering and enumerating QUERIES
must never import ``google.protobuf``, ``pyspark.sql.streaming.proto``,
or ``hours_api_clickup_spark.streaming.tws``.

Two layers:

1. subprocess with a meta-path blocker that raises ImportError for the
   protobuf module families, then imports the full registry and
   enumerates every query fn — proves registration-time isolation even
   if protobuf were importable only lazily;
2. a static scan of the registry family modules for tws imports inside
   function bodies — proves execution-time isolation without having to
   run every streaming query under the blocker (query fns only import
   from streaming/{refresh,sessions,ledger}.py, none of which touch
   tws).
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

PKG = pathlib.Path(__file__).resolve().parents[1] / "hours_api_clickup_spark"

_BLOCKER = r"""
import sys

BLOCKED = ("google.protobuf", "pyspark.sql.streaming.proto",
           "hours_api_clickup_spark.streaming.tws")

class _Block:
    def find_module(self, name, path=None):
        return self if name.startswith(BLOCKED) else None
    def find_spec(self, name, path=None, target=None):
        if name.startswith(BLOCKED):
            raise ImportError(f"blocked by test: {name}")
        return None

sys.meta_path.insert(0, _Block())

from hours_api_clickup_spark.plans.registry import QUERIES

assert len(QUERIES) >= 150, f"registry truncated: {len(QUERIES)}"
assert "streaming_stateful_ledger" in QUERIES, (
    "protobuf-less environment lost the applyInPandasWithState ledger row"
)
for name, spec in QUERIES.items():
    assert callable(spec.fn), name

for mod in list(sys.modules):
    assert not mod.startswith(BLOCKED), f"{mod} imported during registration"

print("OK", len(QUERIES))
"""


def test_registry_registers_without_protobuf():
    proc = subprocess.run(
        [sys.executable, "-c", _BLOCKER],
        capture_output=True,
        text=True,
        cwd=str(PKG.parent),
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.startswith("OK"), proc.stdout


def test_registry_modules_never_import_tws():
    pat = re.compile(r"^\s*(from|import)\s+\S*\btws\b", re.MULTILINE)
    for f in sorted((PKG / "plans").glob("registry*.py")):
        hits = pat.findall(f.read_text())
        assert not hits, f"{f.name} imports streaming.tws: {hits}"
