#!/usr/bin/env python3
"""Assert-based tests for the measurement tooling (NOT shipped code).

Run directly: python3 tools/test_tools.py   (prints OK on success)
"""
import io, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duck_bench
import scalebench_table


def test_crossover_candidates_numeric_order():
    names = ["CROSSOVER_r9.json", "CROSSOVER_r100.json", "CROSSOVER_r14.json",
             "CROSSOVER_r15.json", "PAIRING_r14.json", "CROSSOVER_r1b.json",
             "CROSSOVER_r2.json.bak"]
    got = duck_bench.crossover_candidates(names)
    assert got == ["CROSSOVER_r100.json", "CROSSOVER_r15.json",
                   "CROSSOVER_r14.json", "CROSSOVER_r9.json"], got


def test_floor_resident_base_mismatch_skipped(tmp=None):
    # adjudication must ignore artifacts whose base is a different SF dir
    import json, tempfile, unittest.mock as mock
    with tempfile.TemporaryDirectory() as d:
        row = {"x1": {"ratio": 2.2}, "x10": {"ratio": 0.5}}
        json.dump({"base": "/data/sf0.1", "queries": {"q97": row}},
                  open(os.path.join(d, "CROSSOVER_r9.json"), "w"))
        json.dump({"base": "/data/sf0.01", "queries": {"q97": row}},
                  open(os.path.join(d, "CROSSOVER_r14.json"), "w"))
        with mock.patch.object(os, "listdir", return_value=os.listdir(d)), \
             mock.patch.object(duck_bench, "open", create=True,
                               side_effect=lambda p, *a, **k: io.open(
                                   os.path.join(d, os.path.basename(p)), *a, **k)):
            # newest artifact (r14) has the wrong base -> falls through to r9
            out = duck_bench.floor_resident_adjudication(["q97"], "/data/sf0.1")
            assert out["q97"]["artifact"] == "CROSSOVER_r9.json", out
            # no artifact matches this base -> empty
            assert duck_bench.floor_resident_adjudication(["q97"],
                                                          "/data/sf9") == {}


def test_pinned_floors_attached_to_warm_residue():
    # a warm over-2x entry with a PINNED_FLOORS row gets the committed
    # adjudication attached; entries without one don't; the weak set
    # itself is unchanged (the bar is the bar)
    import json, tempfile
    with tempfile.TemporaryDirectory() as d:
        dur = {"q72_hll_merge": 0.3, "q95_other": 0.3, "q01_fast": 1.0}
        cold = {"queries": {k: 0.5 for k in dur}, "env": {"warm": 0}}
        warm = {"queries": {"q72_hll_merge": 0.9, "q95_other": 0.9,
                            "q01_fast": 0.5}, "env": {"warm": 2}}
        paths = []
        for i, b in enumerate((cold, warm)):
            p = os.path.join(d, f"b{i}.json")
            json.dump(b, open(p, "w"))
            paths.append(p)
        out_path = os.path.join(d, "pairing.json")
        duck_bench.write_pairing(dur, paths, out_path, "/data/sf-none", 3)
        got = json.load(open(out_path))["summary"]["warm"]
        assert got["over_2x_nontrivial"] == ["q72_hll_merge", "q95_other"], got
        assert list(got["pinned_floors"]) == ["q72_hll_merge"], got
        assert "300x" in got["pinned_floors"]["q72_hll_merge"]


def test_scalebench_cell_missing_key():
    best = {1: {"vocab_df": 1.0}, 10: {}, 100: {"vocab_df": 3.0}}
    assert scalebench_table.cell(best, "vocab_df", 1) == "1.0s"
    assert scalebench_table.cell(best, "vocab_df", 10) == "—"
    assert scalebench_table.cell(best, ("a", "b"), 100) == "—"
    assert scalebench_table.have(best, "vocab_df", 100)


if __name__ == "__main__":
    test_crossover_candidates_numeric_order()
    test_floor_resident_base_mismatch_skipped()
    test_pinned_floors_attached_to_warm_residue()
    test_scalebench_cell_missing_key()
    print("OK")
