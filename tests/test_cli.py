"""CLI workflow end-to-end: the reference's file-based cloud/client split
(README.md:46-50, Makefile:6-26) — keygen -> encrypt -> eval -> decrypt and
the convert/tlwetn scenario programs, all through files in a temp dir."""

import subprocess
import sys

import pytest

from torus_fhe_tpu import cli


def run_cli(args, cwd):
    return cli.main(["--platform", "cpu"] + args)


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_keygen_encrypt_eval_decrypt(workdir, capsys):
    assert run_cli(["keygen", "--params", "tfhe_test_small"], workdir) == 0
    assert run_cli(["encrypt", "27", "--bits", "8", "--out", "a.npz",
                    "--seed", "1"], workdir) == 0
    assert run_cli(["encrypt", "202", "--bits", "8", "--out", "b.npz",
                    "--seed", "2"], workdir) == 0
    assert run_cli(["eval", "and", "a.npz", "b.npz", "--out", "c.npz"],
                   workdir) == 0
    capsys.readouterr()
    assert run_cli(["decrypt", "c.npz", "--bits", "8"], workdir) == 0
    out = capsys.readouterr().out.strip()
    assert int(out) == (27 & 202)


@pytest.mark.slow
def test_convert_scenario(workdir, capsys):
    assert run_cli(["keygen", "--params", "tfhe_test_small"], workdir) == 0
    rc = run_cli(["convert", "13452", "223416", "--bits", "8"], workdir)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "direct decrypt" in out and "[OK]" in out


@pytest.mark.slow
def test_tlwetn_scenario(workdir, capsys):
    rc = run_cli(["tlwetn", "3", "5", "1", "2", "4"], workdir)
    out = capsys.readouterr().out
    assert rc == 0, out
    # the small-bound end of the sweep must decrypt correctly
    assert "[OK]" in out.strip().splitlines()[-1]


def test_knn_scenario(workdir, capsys, tmp_path):
    """bin/KNN_medical_data via the CLI at tiny sizes (2-party multikey,
    threshold tail included)."""
    import numpy as np

    csv = str(tmp_path / "cardio.csv")
    with open(csv, "w") as f:
        f.write("id,c0,c1,label\n")
        rows = [(0, 1, 2, 1), (1, 6, 7, 0), (2, 7, 7, 1)]
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    rc = run_cli(["knn", csv, "--tiny", "--parties", "2", "--k", "1",
                  "--width", "4", "--shift", "0", "--train-rows", "2",
                  "--test-rows", "1"], workdir)
    out = capsys.readouterr().out
    assert rc == 0, out
    import json

    res = json.loads(out.strip().splitlines()[-1])
    assert res["matches_oracle"], res
    assert res["threshold_tail"], res
