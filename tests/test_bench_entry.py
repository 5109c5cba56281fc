"""bench.py's driver contract: the entry point must emit exactly one
JSON line even when the TPU tunnel is fully down (observed round 3:
jax.devices() hangs at plugin init for hours), via the last-good
fallback.  The heavy measurement path itself runs only on the chip."""
import importlib.util
import io
import contextlib
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location('bench',
                                                  REPO / 'bench.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_last_good_marks_stale_and_keeps_contract():
    b = _load_bench()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ok = b._emit_last_good('unit-test outage')
    assert ok, 'BENCH_LAST_GOOD.json must ship with the repo'
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, 'driver contract: exactly ONE JSON line'
    rec = json.loads(lines[0])
    # primary driver fields intact
    assert rec['metric'] == 'cam_crf_pseudolabel_gen'
    assert rec['unit'] == 'images/sec/chip'
    assert rec['value'] > 0 and rec['vs_baseline'] > 0
    # loud staleness marker, no internal commit stamp leaking upward
    assert 'unit-test outage' in rec['extras']['STALE']
    assert 'measured_at_commit' not in rec


def test_record_last_good_stamps_commit(tmp_path):
    b = _load_bench()
    # _record_last_good resolves the repo root from the module __file__
    b._record_last_good.__globals__['__file__'] = str(
        tmp_path / 'bench.py')
    res = {'metric': 'm', 'value': 1.0, 'unit': 'u', 'vs_baseline': 1.0,
           'extras': {}}
    b._record_last_good(res)
    rec = json.loads((tmp_path / 'BENCH_LAST_GOOD.json').read_text())
    assert rec['value'] == 1.0
    assert 'measured_at_commit' in rec    # 'unknown' outside a checkout
