"""ddti-prepare: raw DDTI XML polygon annotations -> paired mask dump.

The real dump's format (one <case>.xml per case, <mark><image>n</image>
<svg>JSON-polygons</svg></mark>, frames named <case>_<n>.jpg) is
synthesized here; the reference has no counterpart tool (its loader
assumes masks already exist, /root/reference/data/data_loader.py:14).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from ddti_tpu.cli import prepare as prep
from ddti_tpu.cli.split_data import find_pairs

CASE_XML = """<?xml version="1.0" encoding="utf-8"?>
<case>
  <number>{case}</number>
  <mark>
    <image>1</image>
    <svg>{svg1}</svg>
  </mark>
  <mark>
    <image>2</image>
    <svg>{svg2}</svg>
  </mark>
</case>
"""


def _square(x0, y0, x1, y1):
    return {"points": [{"x": x0, "y": y0}, {"x": x1, "y": y0},
                       {"x": x1, "y": y1}, {"x": x0, "y": y1}]}


def _write_raw_case(d, case, size=(64, 48), svg1=None, svg2=""):
    """One case: two frames + an XML annotating frame 1 (and optionally 2)."""
    if svg1 is None:
        svg1 = json.dumps([_square(10, 10, 30, 30)])
    for n in (1, 2):
        Image.new("L", size, 128).save(os.path.join(d, f"{case}_{n}.jpg"))
    with open(os.path.join(d, f"{case}.xml"), "w") as f:
        f.write(CASE_XML.format(case=case, svg1=svg1, svg2=svg2))


def test_parse_case_marks(tmp_path):
    d = str(tmp_path)
    _write_raw_case(d, "7", svg2=json.dumps([_square(0, 0, 5, 5),
                                             _square(20, 20, 40, 40)]))
    marks = prep.parse_case_marks(os.path.join(d, "7.xml"))
    assert set(marks) == {1, 2}
    assert len(marks[1]) == 1 and len(marks[2]) == 2
    assert marks[1][0][0] == (10.0, 10.0)


def test_parse_tolerates_malformed(tmp_path):
    xml = str(tmp_path / "9.xml")
    with open(xml, "w") as f:
        f.write("<case><mark><image>x</image><svg>[]</svg></mark>"
                "<mark><image>1</image><svg>not json</svg></mark>"
                "<mark><image>2</image><svg>"
                + json.dumps([{"points": [{"x": 1, "y": 1}]},  # <3 points
                              _square(2, 2, 8, 8)])
                + "</svg></mark></case>")
    marks = prep.parse_case_marks(xml)
    # frame 1 -> parsed but no valid polygons; frame 2 -> one valid polygon
    assert marks[1] == [] and len(marks[2]) == 1


def test_rasterize_fills_polygon_union():
    m = np.asarray(prep.rasterize_mask(
        (64, 48), [[(10, 10), (30, 10), (30, 30), (10, 30)],
                   [(40, 5), (50, 5), (50, 15), (40, 15)]]))
    assert m.shape == (48, 64)  # (H, W) from (W, H) size
    assert m[20, 20] == 255 and m[10, 45] == 255  # inside each polygon
    assert m[40, 5] == 0 and m.max() == 255 and set(np.unique(m)) <= {0, 255}


def test_prepare_end_to_end(tmp_path):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "flat")
    os.makedirs(raw)
    _write_raw_case(raw, "100")
    _write_raw_case(raw, "101", svg2=json.dumps([_square(5, 5, 20, 20)]))
    rc = prep.main(["--source", raw, "--output", out, "--copy"])
    assert rc == 0
    # annotated-empty frames (svg2="" for case 100) skipped by default
    names = {"100_1", "101_1", "101_2"}
    pairs, unpaired = find_pairs(out)
    assert {os.path.splitext(img)[0] for img, _ in pairs} == names
    assert unpaired == []
    # mask content: filled square survives JPEG round-trip at threshold 0.5
    m = np.asarray(Image.open(os.path.join(out, "100_1_mask.jpg")),
                   dtype=np.float32) / 255.0
    assert m[20, 20] > 0.5 and m[40, 50] < 0.5
    manifest = json.load(open(os.path.join(out, "prepare_manifest.json")))
    assert sorted(manifest["pairs"]) == sorted(names)
    assert manifest["skipped_empty"] == ["100_2"]


def test_prepare_keep_empty_and_png(tmp_path):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "flat")
    os.makedirs(raw)
    _write_raw_case(raw, "100")
    rc = prep.main(["--source", raw, "--output", out, "--copy",
                    "--keep_empty", "--mask_format", "png"])
    assert rc == 0
    empty = np.asarray(Image.open(os.path.join(out, "100_2_mask.png")))
    assert empty.max() == 0 and empty.shape == (48, 64)
    full = np.asarray(Image.open(os.path.join(out, "100_1_mask.png")))
    assert set(np.unique(full)) == {0, 255}  # png = lossless binary


def test_prepare_single_frame_bare_name(tmp_path):
    """Mirrors that name single-frame cases <case>.jpg (no _1 suffix)."""
    raw, out = str(tmp_path / "raw"), str(tmp_path / "flat")
    os.makedirs(raw)
    Image.new("L", (32, 32), 100).save(os.path.join(raw, "55.jpg"))
    with open(os.path.join(raw, "55.xml"), "w") as f:
        f.write("<case><mark><image>1</image><svg>"
                + json.dumps([_square(4, 4, 12, 12)]) + "</svg></mark></case>")
    rc = prep.main(["--source", raw, "--output", out, "--copy"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "55_1.jpg"))
    assert os.path.exists(os.path.join(out, "55_1_mask.jpg"))


def test_prepare_missing_frame_warns_not_fatal(tmp_path, capsys):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "flat")
    os.makedirs(raw)
    _write_raw_case(raw, "100")
    os.remove(os.path.join(raw, "100_1.jpg"))  # mark for frame 1 dangles
    with open(os.path.join(raw, "100.xml")) as f:
        pass  # xml still references frame 1
    rc = prep.main(["--source", raw, "--output", out, "--copy",
                    "--keep_empty"])
    assert rc == 0  # frame 2 (empty, kept) still produced a pair
    captured = capsys.readouterr().out
    assert "no matching frame image" in captured and "100_1" in captured


def test_prepare_empty_source_fails(tmp_path):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "flat")
    os.makedirs(raw)
    assert prep.main(["--source", raw, "--output", out]) == 1


def test_prepared_dump_feeds_dataset(tmp_path):
    """The full ingestion chain: prepare -> split -> MedicalDataset."""
    from ddti_tpu.cli import split_data
    from ddti_tpu.data import MedicalDataset

    raw, flat, tree = (str(tmp_path / d) for d in ("raw", "flat", "tree"))
    os.makedirs(raw)
    for case in range(4):
        _write_raw_case(raw, str(case),
                        svg2=json.dumps([_square(5, 5, 25, 25)]))
    assert prep.main(["--source", raw, "--output", flat, "--copy"]) == 0
    assert split_data.main(["--source", flat, "--output", tree, "--copy",
                            "--ratios", "0.5,0.25,0.25"]) == 0
    ds = MedicalDataset(os.path.join(tree, "train"),
                        os.path.join(tree, "train_mask"))
    assert len(ds) >= 1
    img, mask = ds[0]
    assert img.size == (64, 48) and mask.size == (64, 48)
