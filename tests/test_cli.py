"""The ``python -m tsrollup.job`` CLI surface (in-process: the test session's
Ray is already up, exercising the ray-job-driver branch of main())."""

import json

import pytest

from tsrollup import job


def test_cli_runs_and_resumes(ray_session, tiny_input_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = job.main(["--input", tiny_input_dir, "--out", out, "--tiers", "1m,1h"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert res["1m"]["skipped"] is False and res["1h"]["skipped"] is False
    rc = job.main(["--input", tiny_input_dir, "--out", out, "--tiers", "1m,1h"])
    res = json.loads(capsys.readouterr().out)
    assert rc == 0 and res["1m"]["skipped"] is True and res["1h"]["skipped"] is True


def test_cli_yaml_config(ray_session, tiny_input_dir, tmp_path, capsys):
    cfgf = tmp_path / "c.yaml"
    cfgf.write_text("wavelet: haar\ntiers: ['1m']\ngapfill_method: zero\n")
    out = str(tmp_path / "out")
    rc = job.main(["--input", tiny_input_dir, "--out", out, "--config", str(cfgf)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert set(res) == {"1m"}


def test_cli_rejects_bad_retention(ray_session, tiny_input_dir, tmp_path):
    with pytest.raises(SystemExit):
        job.main(["--input", tiny_input_dir, "--out", str(tmp_path), "--retention", "oops"])
