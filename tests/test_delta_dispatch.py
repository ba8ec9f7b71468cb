"""Mocked-dispatch tests for :class:`DeltaBackend` (r11 VERDICT #4).

The contract suite's delta rows have never EXECUTED in-sandbox (no
delta-spark runtime), so a typo in the delta code paths could hide
behind the reasoned skip forever.  These tests inject a fake ``delta``
package plus recording spark/DataFrame handles, so every dispatch path —
versions / read / commit / append / row_count — runs its real Python
code against the public Delta API surface it targets.  They prove
DISPATCH (the right API called with the right arguments, the right
fallbacks taken), not Delta's own semantics — those stay with the
parameterized contract suite, which runs unchanged on a real cluster.
"""

from __future__ import annotations

import sys
import types

import pytest


# ---------------------------------------------------------------------------
# fakes: the delta.tables surface + recording spark handles (no JVM)
# ---------------------------------------------------------------------------
class _Recorder:
    def __init__(self):
        self.calls: list[tuple] = []


class FakeRow:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class FakeHistoryDF:
    def __init__(self, rows):
        self._rows = rows

    def select(self, *cols):
        return self

    def collect(self):
        return self._rows


class FakeDeltaTable:
    """Stands in for ``delta.tables.DeltaTable``."""

    existing_paths: set = set()
    history_rows: list = []
    forPath_calls: list = []

    @classmethod
    def isDeltaTable(cls, spark, path):
        return path in cls.existing_paths

    @classmethod
    def forPath(cls, spark, path):
        cls.forPath_calls.append(path)
        inst = cls.__new__(cls)
        return inst

    def history(self):
        return FakeHistoryDF(type(self).history_rows)


class FakeReader:
    def __init__(self, rec, result):
        self.rec = rec
        self._result = result

    def format(self, fmt):
        self.rec.calls.append(("format", fmt))
        return self

    def option(self, k, v):
        self.rec.calls.append(("option", k, v))
        return self

    def load(self, path):
        self.rec.calls.append(("load", path))
        return self._result


class FakeLoadedDF:
    def __init__(self, n=0):
        self._n = n

    def count(self):
        return self._n


class FakeWriter:
    def __init__(self, rec):
        self.rec = rec

    def format(self, fmt):
        self.rec.calls.append(("format", fmt))
        return self

    def mode(self, m):
        self.rec.calls.append(("mode", m))
        return self

    def option(self, k, v):
        self.rec.calls.append(("option", k, v))
        return self

    def partitionBy(self, *cols):
        self.rec.calls.append(("partitionBy", cols))
        return self

    def save(self, path):
        self.rec.calls.append(("save", path))


class FakeWriteDF:
    def __init__(self, rec):
        self.rec = rec
        self.write = FakeWriter(rec)


class FakeSpark:
    def __init__(self, loaded=None):
        self.rec = _Recorder()
        self.read = FakeReader(self.rec, loaded or FakeLoadedDF())


@pytest.fixture
def delta_backend(monkeypatch):
    """A DeltaBackend constructed against the injected fake delta pkg."""
    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = FakeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)
    FakeDeltaTable.existing_paths = set()
    FakeDeltaTable.history_rows = []
    FakeDeltaTable.forPath_calls = []

    from e_commerce_data_lakehouse_spark.sources.backends import DeltaBackend

    def make(spark=None, **kw):
        return DeltaBackend(spark or FakeSpark(), "/tbl", **kw)

    return make


def test_constructor_requires_delta(spark, tmp_path):
    """Without the fake module the constructor raises the reasoned
    unavailability error (the in-sandbox behavior)."""
    from e_commerce_data_lakehouse_spark.sources.backends import (
        BackendUnavailable,
        DeltaBackend,
    )

    if "delta" in sys.modules:  # pragma: no cover - env guard
        pytest.skip("a real delta runtime is present")
    with pytest.raises(BackendUnavailable, match="delta-spark"):
        DeltaBackend(spark, str(tmp_path / "t"))


def test_versions_empty_when_not_a_delta_table(delta_backend):
    b = delta_backend()
    assert b.versions() == []


def test_versions_sorted_from_history(delta_backend):
    FakeDeltaTable.existing_paths = {"/tbl"}
    FakeDeltaTable.history_rows = [
        FakeRow(version=2), FakeRow(version=0), FakeRow(version=1),
    ]
    b = delta_backend()
    assert b.versions() == [0, 1, 2]


def test_read_dispatches_version_as_of(delta_backend):
    loaded = FakeLoadedDF(7)
    sp = FakeSpark(loaded)
    b = delta_backend(spark=sp)
    out = b.read(3)
    assert out is loaded
    assert sp.rec.calls == [
        ("format", "delta"), ("option", "versionAsOf", 3), ("load", "/tbl"),
    ]


def test_commit_overwrites_with_schema_evolution(delta_backend):
    b = delta_backend(partition_by=("y", "m"), optimized_write=True)
    rec = _Recorder()
    b.commit(FakeWriteDF(rec))
    assert ("format", "delta") in rec.calls
    assert ("mode", "overwrite") in rec.calls
    assert ("option", "optimizeWrite", "true") in rec.calls
    assert ("option", "overwriteSchema", "true") in rec.calls
    assert ("partitionBy", ("y", "m")) in rec.calls
    assert rec.calls[-1] == ("save", "/tbl")


def test_append_does_not_overwrite_schema(delta_backend):
    b = delta_backend()
    rec = _Recorder()
    b.append_files(FakeWriteDF(rec))
    assert ("mode", "append") in rec.calls
    assert not any(c[:2] == ("option", "overwriteSchema") for c in rec.calls)
    assert not any(c[0] == "partitionBy" for c in rec.calls)
    assert rec.calls[-1] == ("save", "/tbl")


def _w(version, mode, rows):
    return FakeRow(
        version=version,
        operation="WRITE",
        operationParameters={"mode": mode},
        operationMetrics={"numOutputRows": str(rows)},
    )


def test_row_count_from_history_overwrite_plus_appends(delta_backend):
    """The metadata path (r11 ADVICE): overwrite(10) + append(5) +
    append(2) answers 17 at v2 and 15 at v1 with ZERO reads."""
    FakeDeltaTable.existing_paths = {"/tbl"}
    FakeDeltaTable.history_rows = [
        _w(0, "Overwrite", 10), _w(1, "Append", 5), _w(2, "Append", 2),
    ]
    sp = FakeSpark(FakeLoadedDF(999))  # a read would return the sentinel
    b = delta_backend(spark=sp)
    assert b.row_count(2) == 17
    assert b.row_count(1) == 15
    assert b.row_count(0) == 10
    assert sp.rec.calls == []  # never touched the data


def test_row_count_later_overwrite_resets_the_chain(delta_backend):
    FakeDeltaTable.existing_paths = {"/tbl"}
    FakeDeltaTable.history_rows = [
        _w(0, "Overwrite", 10), _w(1, "Append", 5), _w(2, "Overwrite", 3),
        _w(3, "Append", 1),
    ]
    b = delta_backend(spark=FakeSpark(FakeLoadedDF(999)))
    assert b.row_count(3) == 4
    assert b.row_count(2) == 3
    assert b.row_count(1) == 15


def test_row_count_falls_back_on_foreign_operation(delta_backend):
    """A MERGE (or any non-WRITE op) interrupts the chain: the backend
    must fall back to an exact count over the versionAsOf snapshot."""
    FakeDeltaTable.existing_paths = {"/tbl"}
    FakeDeltaTable.history_rows = [
        _w(0, "Overwrite", 10),
        FakeRow(version=1, operation="MERGE", operationParameters={},
                operationMetrics={"numTargetRowsInserted": "4"}),
        _w(2, "Append", 5),
    ]
    sp = FakeSpark(FakeLoadedDF(42))
    b = delta_backend(spark=sp)
    assert b.row_count(2) == 42
    assert ("option", "versionAsOf", 2) in sp.rec.calls
    # ...but a version BEFORE the merge still answers from the log
    sp.rec.calls.clear()
    assert b.row_count(0) == 10
    assert sp.rec.calls == []


def test_row_count_falls_back_on_missing_metrics(delta_backend):
    FakeDeltaTable.existing_paths = {"/tbl"}
    FakeDeltaTable.history_rows = [
        FakeRow(version=0, operation="WRITE",
                operationParameters={"mode": "Overwrite"},
                operationMetrics={}),
    ]
    sp = FakeSpark(FakeLoadedDF(13))
    b = delta_backend(spark=sp)
    assert b.row_count(0) == 13


def test_vpath_is_logical(delta_backend):
    b = delta_backend()
    assert b.vpath(5) == "/tbl"
