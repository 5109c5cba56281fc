"""xlsx interop: stdlib writer/reader vs the reference's df.to_excel
protocol (01_train/utilities.py:181-193, 03a model.py:740-745,
03c demo.py:233-238; consumed by scripts/extract_eval.py:20-25,93-96)."""
import os
import zipfile

import numpy as np
import pytest

from wsss_tpu.eval import reports, xlsx


def test_roundtrip_cells(tmp_path):
    rows = [[None, 'Class', 'IoU'],
            [0, 'background', 0.5],
            [1, 'a&b <c>', -1],
            [2, 'ünïcode', 12345],
            [3, 'Mean', 0.123456789]]
    path = str(tmp_path / 't.xlsx')
    xlsx.write_xlsx(path, rows)
    back = xlsx.read_xlsx(path)
    assert back[0] == [None, 'Class', 'IoU']
    assert back[1] == [0, 'background', 0.5]
    assert back[2] == [1, 'a&b <c>', -1]
    assert back[3] == [2, 'ünïcode', 12345]
    assert back[4][1] == 'Mean'
    assert back[4][2] == pytest.approx(0.123456789)


def test_table_roundtrip(tmp_path):
    cols = {'Class': ['bg', 'fg', 'Mean'], 'IoU': [0.25, 0.75, 0.5]}
    path = str(tmp_path / 'metrics_x.xlsx')
    xlsx.write_table_xlsx(path, cols)
    back = xlsx.read_table_xlsx(path)
    assert back['Class'] == cols['Class']
    assert back['IoU'] == pytest.approx(cols['IoU'])
    # df.to_excel layout: blank index header + integer index column
    raw = xlsx.read_xlsx(path)
    assert raw[0][0] is None and raw[1][0] == 0 and raw[2][0] == 1
    assert xlsx.table_mean_value(path) == pytest.approx(0.5)


def _write_pandas_style_xlsx(path):
    """Simulate what pandas+openpyxl emit: sharedStrings table, r attrs,
    per-sheet rels indirection — the file format the reference's eval
    trees actually contain."""
    ns = 'http://schemas.openxmlformats.org/spreadsheetml/2006/main'
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="B1" t="s"><v>0</v></c>'
        '<c r="C1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>0</v></c><c r="B2" t="s"><v>2</v></c>'
        '<c r="C2"><v>0.41</v></c></row>'
        '<row r="3"><c r="A3"><v>1</v></c><c r="B3" t="s"><v>3</v></c>'
        '<c r="C3"><v>0.31298</v></c></row>'
        '</sheetData></worksheet>')
    sst = (f'<sst xmlns="{ns}" count="4" uniqueCount="4">'
           '<si><t>Class</t></si><si><t>IoU</t></si>'
           '<si><t>aeroplane</t></si><si><t>Mean</t></si></sst>')
    wb = (f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats'
          '.org/officeDocument/2006/relationships"><sheets>'
          '<sheet name="S" sheetId="1" r:id="rId9"/></sheets></workbook>')
    rels = ('<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId9" Type="t" Target="worksheets/data.xml"'
            '/></Relationships>')
    with zipfile.ZipFile(path, 'w') as z:
        z.writestr('xl/workbook.xml', wb)
        z.writestr('xl/_rels/workbook.xml.rels', rels)
        z.writestr('xl/worksheets/data.xml', sheet)
        z.writestr('xl/sharedStrings.xml', sst)


def test_read_reference_style_sharedstrings(tmp_path):
    path = str(tmp_path / 'metrics_ref.xlsx')
    _write_pandas_style_xlsx(path)
    table = xlsx.read_table_xlsx(path)
    assert table['Class'] == ['aeroplane', 'Mean']
    assert table['IoU'] == pytest.approx([0.41, 0.31298])
    assert xlsx.table_mean_value(path) == pytest.approx(0.31298)


def test_write_iou_csv_emits_reference_xlsx(tmp_path):
    path = str(tmp_path / 'run' / 'val_iou.csv')
    iou = np.array([0.2, 0.4])
    prec = np.array([0.5, 0.7])
    rec = np.array([0.1, 0.3])
    miou = reports.write_iou_csv(path, ['bg', 'fg'], iou, prec, rec)
    table = xlsx.read_table_xlsx(str(tmp_path / 'run' / 'val_iou.xlsx'))
    assert table['Class'] == ['bg', 'fg', 'Mean']
    assert table['IoU'][-1] == pytest.approx(miou)
    assert table['Precision'] == pytest.approx([0.5, 0.7, 0.6])
    assert table['Recall'][-1] == pytest.approx(0.2)


def test_write_metrics_csv_emits_reference_xlsx(tmp_path):
    path = str(tmp_path / 'm' / 'sess_metrics.csv')
    reports.write_metrics_csv(path, ['c1', 'c2'],
                              {'TPR': np.array([0.9, 0.7]),
                               'F1': np.array([0.6, 0.4])})
    table = xlsx.read_table_xlsx(str(tmp_path / 'm' / 'sess_metrics.xlsx'))
    assert table['HTT'] == ['c1', 'c2', 'Average']
    assert table['TPR'] == pytest.approx([0.9, 0.7, 0.8])
    assert table['F1'][-1] == pytest.approx(0.5)


def test_extract_eval_mixed_tree(tmp_path):
    root = str(tmp_path / 'eval')
    # our csv output (with its xlsx sibling — must not double count)
    reports.write_iou_csv(os.path.join(root, 'runA', 'val_iou.csv'),
                          ['bg', 'fg'], np.array([0.2, 0.6]))
    # a reference-produced xlsx (no csv sibling)
    ref_dir = os.path.join(root, 'SEC', 'VOC2012')
    os.makedirs(ref_dir)
    _write_pandas_style_xlsx(os.path.join(ref_dir, 'metrics_VOC.xlsx'))
    # a temp-file artifact the reference skips (extract_eval.py:93)
    _write_pandas_style_xlsx(os.path.join(ref_dir, '~metrics_VOC.xlsx'))
    rows = reports.extract_eval(root)
    got = {r['run']: float(r['miou']) for r in rows}
    assert len(rows) == 2
    assert got[os.path.join('runA', 'val_iou.csv')] == pytest.approx(
        0.4, abs=1e-5)
    assert got[os.path.join('SEC', 'VOC2012', 'metrics_VOC.xlsx')] == \
        pytest.approx(0.31298)


def test_column_name_helpers():
    assert xlsx._col_name(0) == 'A'
    assert xlsx._col_name(25) == 'Z'
    assert xlsx._col_name(26) == 'AA'
    assert xlsx._col_name(27 * 26 - 1) == 'ZZ'
    for i in (0, 1, 25, 26, 51, 701, 702):
        assert xlsx._col_index(xlsx._col_name(i) + '13') == i
