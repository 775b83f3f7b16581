"""bench.py's pure pieces — the driver parses its one JSON line, so the
variant grammar and the roofline refusal must stay locked."""

import importlib.util
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
