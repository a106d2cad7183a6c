"""Pin the driver-hash parity tool's semantics (tools/hash_parity.py).

Round-4 lesson: the driver's correctness gate serializes RAW pandas
values, so a null-free DuckDB float64 column (HUGEINT from an uncast
``SUM(BIGINT)``) prints ``123.0`` against Spark's int64 ``123`` and
reds the entry even though every value is identical.  The parity tool
must therefore (a) hash value-identical frames identically, and
(b) FAIL HARD on int-vs-float dtype-kind drift for null-free columns.
These tests pin both behaviors so a future edit cannot silently
re-soften the tool back into the state that masked all four round-4
reds.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys

import numpy as np
import pandas as pd

_SPEC = importlib.util.spec_from_file_location(
    "hash_parity",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "hash_parity.py")
hash_parity = importlib.util.module_from_spec(_SPEC)
sys.modules["hash_parity"] = hash_parity
_SPEC.loader.exec_module(hash_parity)

canon_value = hash_parity.canon_value
canon_hash = hash_parity.canon_hash
kind_drift_failures = hash_parity.kind_drift_failures


class TestCanonValue:
    def test_integral_float_collapses_to_int_string(self):
        # the VALUE hash tolerates pandas NULL-widening: 123.0 == 123
        assert canon_value(123.0) == "123"
        assert canon_value(np.float64(123.0)) == "123"
        assert canon_value(123) == "123"

    def test_negative_zero_canonicalized(self):
        assert canon_value(-0.0) == "0"
        assert canon_value(0.0) == "0"

    def test_non_integral_float_uses_repr(self):
        assert canon_value(0.1) == repr(0.1)

    def test_nan_and_null(self):
        assert canon_value(float("nan")) == "NaN"
        assert canon_value(None) == "NULL"
        assert canon_value(pd.NA) == "NULL"

    def test_large_float_not_collapsed(self):
        # beyond 2**53 float->int round-trips are lossy; keep repr
        big = 2.0 ** 60
        assert canon_value(big) == repr(big)

    def test_bool_not_confused_with_int(self):
        assert canon_value(True) == "true"
        assert canon_value(np.bool_(False)) == "false"


class TestCanonHash:
    def test_row_and_column_order_invariant(self):
        a = pd.DataFrame({"x": [1, 2], "y": ["a", "b"]})
        b = pd.DataFrame({"y": ["b", "a"], "x": [2, 1]})
        assert canon_hash(a)[0] == canon_hash(b)[0]

    def test_value_identical_int_vs_float_hash_equal(self):
        # the hash itself is forgiving (NULL-widening symmetry) --
        # the kind-drift check below is what catches the driver case
        a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
        b = pd.DataFrame({"n": pd.array([1.0, 2.0], dtype="float64")})
        assert canon_hash(a)[0] == canon_hash(b)[0]


class TestKindDrift:
    def test_nullfree_int_vs_float_is_flagged(self):
        # the exact round-4 red shape: DuckDB HUGEINT -> float64 vs
        # Spark int64, no NULLs anywhere
        spark_side = pd.DataFrame({"cum": pd.array([1, 3], dtype="int64")})
        duck_side = pd.DataFrame({"cum": pd.array([1.0, 3.0],
                                                  dtype="float64")})
        assert kind_drift_failures(spark_side, duck_side) == ["cum=i/f"]

    def test_column_with_nulls_is_exempt(self):
        # pandas widens BOTH engines' sides to float64 when NULLs are
        # present, so the representations agree -- genuine noise
        spark_side = pd.DataFrame(
            {"d": pd.array([1.0, np.nan], dtype="float64")})
        duck_side = pd.DataFrame(
            {"d": pd.array([1.0, np.nan], dtype="float64")})
        assert kind_drift_failures(spark_side, duck_side) == []

    def test_matching_kinds_not_flagged(self):
        a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
        b = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
        assert kind_drift_failures(a, b) == []

    def test_float_vs_float_not_flagged(self):
        a = pd.DataFrame({"v": pd.array([0.5, 1.5], dtype="float64")})
        b = pd.DataFrame({"v": pd.array([0.5, 1.5], dtype="float64")})
        assert kind_drift_failures(a, b) == []


_BC_SPEC = importlib.util.spec_from_file_location(
    "bench_compare",
    pathlib.Path(__file__).resolve().parents[1] / "tools"
    / "bench_compare.py")
bench_compare = importlib.util.module_from_spec(_BC_SPEC)
sys.modules["bench_compare"] = bench_compare
_BC_SPEC.loader.exec_module(bench_compare)


class TestBenchCompareLoader:
    """Pin bench_compare.load_bench's recovery of per-query timings
    from the driver's FRONT-truncated stdout tail (the BENCH_r05
    shape: the JSON line's head is cut mid-"queries", only the
    trailing "passes" object survives complete)."""

    def _write(self, tmp_path, doc):
        import json
        p = tmp_path / "bench.json"
        p.write_text(json.dumps(doc))
        return str(p)

    def test_full_bench_line_loads_directly(self, tmp_path):
        doc = {"queries": {"q1": 1.0}, "passes": {"q1": [1.2, 1.0]},
               "sf": 0.1}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        assert got["queries"] == {"q1": 1.0}

    def test_truncated_tail_recovers_passes(self, tmp_path):
        tail = ('liers": 1.5, "g_mst": 5.2}, "passes": '
                '{"q1": [1.2, 1.0], "g_mst": [5.2, 5.6]}, "sf": 0.1}')
        doc = {"n": 5, "rc": 0, "sf": 0.1, "tail": tail}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        assert got["queries"] == {"q1": 1.0, "g_mst": 5.2}
        assert "_recovered" in got

    def test_untruncated_tail_parses_whole_line(self, tmp_path):
        tail = ('{"metric": "m", "queries": {"q1": 1.0}, '
                '"passes": {"q1": [1.0]}, "sf": 0.1}')
        doc = {"tail": tail}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        assert got["metric"] == "m"

    def test_leading_name_fragment_dropped_in_regex_fallback(
            self, tmp_path):
        """A front cut landing mid-token can leave a name FRAGMENT
        that still matches the pair regex (ADVICE round 7: '...df":
        [2.1, 1.9]' from llm_tfidf yielding a bogus 'df' entry).  The
        first match is only trusted when it sits on a '{'/',' object
        boundary."""
        tail = '"df": [2.1, 1.9], "g_mst": [5.2, 5.6]'
        doc = {"tail": tail}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        assert got["queries"] == {"g_mst": 5.2}

    def test_boundary_anchored_first_match_kept(self, tmp_path):
        """The converse: a cut that lands cleanly between pairs keeps
        the first intact pair (preceded by ',' from the lost one)."""
        tail = '1.9], "q1": [1.2, 1.0], "g_mst": [5.2, 5.6]'
        doc = {"tail": tail}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        assert got["queries"] == {"q1": 1.0, "g_mst": 5.2}

    def test_no_queries_anywhere_raises(self, tmp_path):
        doc = {"tail": "no json here at all"}
        import pytest
        with pytest.raises(SystemExit):
            bench_compare.load_bench(self._write(tmp_path, doc))

    def test_sf1_block_not_mistaken_for_main_run(self, tmp_path):
        """Round-6 repro: the driver's 2KB tail cut the main run's
        "passes" mid-dict but kept round 6's "sf1" sub-object intact.
        The old loader early-returned any dict with a "queries" key,
        so it handed back the sf1 rung's 10x-scale timings as the
        whole run (bogus 1.54x "regression" vs r5's sf0.1).  Pin:
        (a) the sf1 block is NEVER returned as the main run, and
        (b) the partial sf0.1 pass arrays visible before the sf1
        marker ARE recovered."""
        tail = (
            # front-truncated mid-"passes": a dangling array, then
            # intact sf0.1 entries, then calibration + sf + sf1 block
            'f": [2.129, 1.598], "st_tumbling": [0.607, 0.473], '
            '"ts_ewma": [0.64, 0.48]}, '
            '"calibration": {"before": 0.22, "mid": 0.22, '
            '"after": 0.22, "worst_ratio": 1.02}, "sf": 0.1, '
            '"sf1": {"value": 25.5, "queries": {"g1_pagerank": 5.08, '
            '"llm_minhash_lsh": 8.93}, "passes": {"g1_pagerank": '
            '[6.2, 5.08], "llm_minhash_lsh": [8.93, 10.2]}, '
            '"calibration_after": 0.22}}')
        doc = {"n": 42, "rc": 0, "sf": 0.1, "tail": tail}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        # sf1's 10x timings must NOT appear
        assert "g1_pagerank" not in got["queries"]
        assert got["queries"] == {"st_tumbling": 0.473, "ts_ewma": 0.48}
        assert got["sf"] == 0.1
        assert "_recovered" in got

    def test_complete_compact_line_with_sf1_returns_top_level(
            self, tmp_path):
        """Round-7 bench.py prints a compact line that fits the tail
        whole: the loader must return the TOP-LEVEL object (metric +
        queries), not any sub-object, even though the sf1 sub-object
        also carries a "queries" key."""
        line = ('{"metric": "headline_queries_total", "value": 1.5, '
                '"unit": "sec", "queries": {"q1": 1.5}, "sf": 0.1, '
                '"sf1": {"value": 15.0, "queries": {"q1": 15.0}}}')
        doc = {"tail": line + "\n"}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        assert got["metric"] == "headline_queries_total"
        assert got["queries"] == {"q1": 1.5}

    def test_driver_parsed_field_preferred(self, tmp_path):
        doc = {"parsed": {"metric": "m", "queries": {"q1": 2.0},
                          "sf": 0.1},
               "tail": "garbage"}
        got = bench_compare.load_bench(self._write(tmp_path, doc))
        assert got["queries"] == {"q1": 2.0}

    def test_mixed_sf_comparison_refused(self, tmp_path, capsys):
        import pytest
        a = self._write(tmp_path, {"queries": {"q1": 1.0}, "sf": 0.1})
        import json as _json
        p = tmp_path / "b.json"
        p.write_text(_json.dumps({"queries": {"q1": 10.0}, "sf": 1.0}))
        import sys as _sys
        argv = _sys.argv
        _sys.argv = ["bench_compare", a, str(p)]
        try:
            with pytest.raises(SystemExit, match="mixed-sf"):
                bench_compare.main()
        finally:
            _sys.argv = argv


class TestDiskPreflight:
    """tools/scale_common.disk_preflight — the round-10 post-mortem
    hardening: a disk-bound at-scale receipt run must refuse to start
    when the filesystem lacks the tool's documented peak headroom,
    instead of dying 20 minutes into the DuckDB phase (VERDICT
    round 10, item 5)."""

    def _mod(self):
        spec = importlib.util.spec_from_file_location(
            "scale_common",
            pathlib.Path(__file__).resolve().parents[1]
            / "tools" / "scale_common.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_refuses_when_peak_exceeds_free(self, tmp_path):
        import pytest
        sc = self._mod()
        with pytest.raises(SystemExit, match="documented peak"):
            # no filesystem has an exabyte free
            sc.disk_preflight(1e9, path=str(tmp_path), sweep=False)

    def test_passes_and_returns_free_gb(self, tmp_path):
        sc = self._mod()
        free = sc.disk_preflight(0.0001, path=str(tmp_path),
                                 sweep=False)
        assert free > 0

    def test_sweep_removes_only_stale_dirs(self, tmp_path, monkeypatch):
        import os
        import time
        sc = self._mod()
        stale = tmp_path / "blockmgr-stale"
        live = tmp_path / "blockmgr-live"
        stale.mkdir()
        live.mkdir()
        old = time.time() - 7200
        os.utime(stale, (old, old))
        monkeypatch.setattr(sc, "_STALE_SPILL_GLOBS",
                            (str(tmp_path / "blockmgr-*"),))
        monkeypatch.setattr(sc, "_live_jvm", lambda: False)
        removed = sc.sweep_stale_spill()
        assert removed == 1
        assert not stale.exists() and live.exists()

    def test_sweep_refuses_next_to_live_jvm(self, tmp_path, monkeypatch):
        import os
        import time
        sc = self._mod()
        stale = tmp_path / "blockmgr-stale"
        stale.mkdir()
        old = time.time() - 7200
        os.utime(stale, (old, old))
        monkeypatch.setattr(sc, "_STALE_SPILL_GLOBS",
                            (str(tmp_path / "blockmgr-*"),))
        monkeypatch.setattr(sc, "_live_jvm", lambda: True)
        assert sc.sweep_stale_spill() == 0
        assert stale.exists()

    def test_every_at_scale_tool_is_wired(self):
        # the preflight is only protection if every disk-bound staged
        # tool actually calls it
        tools_dir = pathlib.Path(__file__).resolve().parents[1] / "tools"
        for path in sorted(tools_dir.glob("*_oracle_at_scale.py")):
            assert "disk_preflight" in path.read_text(), path.name


class TestLedgerAudit:
    """tools/ledger_audit.py — round 10's one defect was a prose
    ledger counting a pending receipt as landed; the audit makes the
    checkable part of that class mechanical (official-ledger
    recompute, citation existence, cumulative-claim ceiling)."""

    def _mod(self):
        spec = importlib.util.spec_from_file_location(
            "ledger_audit",
            pathlib.Path(__file__).resolve().parents[1]
            / "tools" / "ledger_audit.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_ledgers_are_honest(self):
        la = self._mod()
        assert la.audit() == []

    def test_recompute_covers_registry(self):
        la = self._mod()
        import __spark_entry__ as entrymod
        latest, greens, reds = la.recompute_official()
        assert set(latest) == set(entrymod.queries())
        assert not reds
