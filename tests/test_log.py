"""Leveled logger + StageTimer CSV (reference Verbose, include/System.h:47-72,
and the SAVE_TIMES per-stage CSV, src/Tracking.cc:945-952)."""

import time

from pli_slam_tpu.utils import log


def test_levels(capsys):
    log.set_level(log.NORMAL)
    log.log("visible", log.NORMAL)
    log.log("hidden", log.DEBUG)
    err = capsys.readouterr().err
    assert "visible" in err and "hidden" not in err
    log.set_level(log.QUIET)
    log.log("quiet-hidden", log.NORMAL)
    assert "quiet-hidden" not in capsys.readouterr().err


def test_stage_timer(tmp_path):
    t = log.StageTimer(["a", "b"])
    for _ in range(3):
        with t.stage("a"):
            time.sleep(0.001)
        with t.stage("b"):
            pass
        t.end_frame()
    means = t.means_ms()
    assert means["a"] >= 1.0 and means["b"] >= 0.0
    p = tmp_path / "times.csv"
    t.save_csv(str(p))
    lines = p.read_text().strip().splitlines()
    assert lines[0] == "frame,a,b"
    assert len(lines) == 4
