"""CLI plumbing tests (no model construction — argument parsing and
validation only; the end-to-end CLI surfaces are exercised by
tests/test_runbook.py and the driver's dryrun)."""

import argparse

import pytest

from adnm_tpu.cli.common import _parse_mesh, add_common_args


def _parse(argv):
    p = argparse.ArgumentParser()
    add_common_args(p)
    return p.parse_args(argv)


class TestMeshSpec:
    def test_valid(self):
        assert _parse_mesh("data=4,seq=2") == (["data", "seq"], [4, 2])
        assert _parse_mesh("data=1") == (["data"], [1])

    def test_malformed_entry(self):
        for bad in ("data", "data=,seq=2", "data=0", "data=-2", "data=x"):
            with pytest.raises(SystemExit):
                _parse_mesh(bad)

    def test_duplicate_axis(self):
        with pytest.raises(SystemExit):
            _parse_mesh("data=2,data=4")

    def test_data_axis_required(self):
        with pytest.raises(SystemExit):
            _parse_mesh("seq=2,model=2")


class TestMultihostFlags:
    def test_parses(self):
        args = _parse([
            "--coordinator", "10.0.0.1:1234",
            "--num-processes", "4", "--process-id", "2",
        ])
        assert args.coordinator == "10.0.0.1:1234"
        assert (args.num_processes, args.process_id) == (4, 2)
        default = _parse([])
        assert default.coordinator is None and default.num_processes is None


class TestRefinerRematFlag:
    def test_parses(self):
        args = _parse(["--model", "ADNMUnet", "--no-refiner-remat"])
        assert args.no_refiner_remat is True
        assert _parse(["--model", "ADNMUnet"]).no_refiner_remat is False

    def test_factory_plumbs(self):
        from adnm_tpu.models import create_model

        m = create_model("ADNMUnet", 5, 20, 6, refiner_remat=False)
        assert m.refiner_remat is False
        assert create_model("ADNMUnet", 5, 20, 6).refiner_remat is True

    def test_kwargs_rejected_for_other_models(self):
        from adnm_tpu.models import create_model

        with pytest.raises(ValueError, match="only supported for ADNMUnet"):
            create_model("SmaATUnet", 5, 20, 6, refiner_remat=False)

    def test_build_guard_non_adnm(self):
        from adnm_tpu.cli.common import build

        args = _parse(["--model", "SmaATUnet", "--no-refiner-remat", "--synthetic"])
        with pytest.raises(SystemExit, match="only supported for --model ADNMUnet"):
            build(args, need_loaders=False)


class TestAttnTypeFlag:
    def test_parses_and_plumbs(self):
        from adnm_tpu.models import create_model

        args = _parse(["--model", "ADNMUnet", "--attn-type", "mla"])
        assert args.attn_type == "mla"
        assert _parse(["--model", "ADNMUnet"]).attn_type == "standard"
        m = create_model("ADNMUnet", 5, 20, 6, attn_type="mla")
        assert m.attn_type == "mla"

    def test_build_guard_non_adnm(self):
        from adnm_tpu.cli.common import build

        args = _parse(["--model", "SmaATUnet", "--attn-type", "mla", "--synthetic"])
        with pytest.raises(SystemExit, match="only supported for --model ADNMUnet"):
            build(args, need_loaders=False)


class TestTransferDtypeFlag:
    def test_parses_and_plumbs_to_loaders(self):
        args = _parse(["--model", "SmaATUnet", "--transfer-dtype", "uint8"])
        assert args.transfer_dtype == "uint8"
        assert _parse(["--model", "SmaATUnet"]).transfer_dtype == "float32"

    def test_rejects_unknown(self):
        with pytest.raises(SystemExit):
            _parse(["--model", "SmaATUnet", "--transfer-dtype", "fp8"])


class TestDispatchModeFlags:
    def test_train_parser_has_flags(self):
        from adnm_tpu.cli.train import make_parser

        args = make_parser().parse_args(
            ["--scan-steps", "4", "--accum-steps", "2", "--synthetic"]
        )
        assert (args.scan_steps, args.accum_steps) == (4, 2)
        default = make_parser().parse_args(["--synthetic"])
        assert (default.scan_steps, default.accum_steps) == (1, 1)

    def test_accum_must_divide_batch(self):
        from adnm_tpu.cli.common import build

        args = _parse(["--model", "SmaATUnet", "--synthetic", "--batch-size", "4"])
        args.accum_steps = 3
        with pytest.raises(SystemExit, match="divide"):
            build(args, need_loaders=False)
