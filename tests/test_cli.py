

def test_rename_runs(tmp_path):
    """scripts/rename_pt.py port: files then folders, both rules."""
    from wsss_tpu.cli.rename_runs import rename_runs
    d = tmp_path / 'DSRG' / 'VGG16_train75_sess'
    d.mkdir(parents=True)
    (d / 'ckpt_train75_final.npz').write_bytes(b'x')
    (d / 'ckpt_train37.5_final.npz').write_bytes(b'y')
    d2 = tmp_path / 'DSRG' / 'M7_train37.5_sess'
    d2.mkdir()
    n = rename_runs(str(tmp_path / 'DSRG'))
    assert n == 4
    assert (tmp_path / 'DSRG' / 'VGG16_sess' / 'ckpt_final.npz').exists()
    assert (tmp_path / 'DSRG' / 'VGG16_sess'
            / 'ckpt_balanced_final.npz').exists()
    assert (tmp_path / 'DSRG' / 'M7_balanced_sess').is_dir()
