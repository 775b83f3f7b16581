"""bench.py's pure pieces — the driver parses its one JSON line, so the
variant grammar and the roofline refusal must stay locked."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_parse_variant_grammar():
    # (table_dtype, sorted, bf16buf, compact, block_kernel, delta)
    assert bench.parse_variant("float32") == ("float32", False, False, False, "off", False)
    assert bench.parse_variant("float32+sorted") == ("float32", True, False, False, "off", False)
    # delta implies sorted+compact; blockkernel implies sorted
    assert bench.parse_variant("float32+delta") == ("float32", True, False, True, "off", True)
    assert bench.parse_variant("int8+sorted+compact+delta") == (
        "int8", True, False, True, "off", True)
    assert bench.parse_variant("float32+blockkernel")[4] == "float32"
    assert bench.parse_variant("float32+blockkernel-bf16")[4] == "bfloat16"


def test_variant_compute_dtype():
    assert bench.variant_compute_dtype("float32+sorted+blockkernel") == "float32"
    assert bench.variant_compute_dtype("float32+sorted+bf16compute") == "bfloat16"
    # must be a '+'-separated tag, not a substring of the dtype part
    assert bench.variant_compute_dtype("bf16compute") == "float32"


def test_roofline_refuses_impossible_numbers():
    model = bench.roofline_model(262144, "float32", wire_bytes=0.0)
    # round-1's retracted 362M ex/s implies >1 TB/s — must raise
    with pytest.raises(RuntimeError, match="physically impossible"):
        bench.check_roofline(362_000_000, model, "test")
    # the measured device capacities must pass
    out = bench.check_roofline(35_851_238, model, "test")
    assert out["implied_gb_per_sec"] < out["hbm_peak_gb_per_sec"]


def test_default_variant_list_parses():
    default = ("float32+sorted+compact+delta+blockkernel,"
               "float32+sorted+compact+delta+blockkernel-bf16+bf16compute,"
               "float32+sorted+compact+delta,"
               "float32+sorted+compact,float32+sorted,float32,"
               "bfloat16+sorted+compact+delta,int8+sorted+compact+delta")
    for spec_ in default.split(","):
        dt, _, _, _, bsk, _ = bench.parse_variant(spec_)
        assert dt in ("float32", "bfloat16", "int8")
        assert bsk in ("off", "float32", "bfloat16")
        assert bench.variant_compute_dtype(spec_) in ("float32", "bfloat16")


def test_persist_or_reference_latest(tmp_path):
    """Complete records persist to BENCH_LATEST.json; incomplete (severe-wire)
    records get a last_complete summary referencing the persisted one."""
    p = str(tmp_path / "BENCH_LATEST.json")
    complete = {
        "value": 19.7e6, "vs_baseline": 731.0, "headline_dtype": "f32+x",
        "variants": {"f32+x": {"examples_per_sec": 19.7e6}},
        "from_disk": {"examples_per_sec": 9.7e6},
        "device_step": {"examples_per_sec": 23.1e6},
        "device_step_bf16": {"examples_per_sec": 35.8e6},
    }
    assert bench.record_is_complete(complete)
    bench.persist_or_reference_latest(complete, p)
    assert os.path.exists(p)
    assert complete["recorded_at"]

    severe = {"value": 23.0e6, "wire_bound_skipped": True, "variants": {},
              "device_step": {"examples_per_sec": 23.0e6}}
    assert not bench.record_is_complete(severe)
    bench.persist_or_reference_latest(severe, p)
    lc = severe["last_complete"]
    assert lc["value"] == 19.7e6
    assert lc["variants_examples_per_sec"] == {"f32+x": 19.7e6}
    assert lc["device_step_bf16_examples_per_sec"] == 35.8e6
    assert lc["from_disk_examples_per_sec"] == 9.7e6

    # no BENCH_LATEST yet -> no reference, no crash
    severe2 = {"value": 1.0, "wire_bound_skipped": True, "variants": {}}
    bench.persist_or_reference_latest(severe2, str(tmp_path / "missing.json"))
    assert "last_complete" not in severe2

    # a complete-but-SLOWER run (congested wire) must NOT overwrite the
    # faster record; it references it as last_complete instead
    slower = dict(complete, value=3.1e6,
                  variants={"f32+x": {"examples_per_sec": 3.1e6}})
    slower.pop("recorded_at", None)
    bench.persist_or_reference_latest(slower, p)
    with open(p) as f:
        kept = json.load(f)
    assert kept["value"] == 19.7e6
    assert slower["last_complete"]["value"] == 19.7e6

    # a complete FASTER run does overwrite
    faster = dict(complete, value=21.0e6)
    faster.pop("recorded_at", None)
    bench.persist_or_reference_latest(faster, p)
    with open(p) as f:
        kept = json.load(f)
    assert kept["value"] == 21.0e6
