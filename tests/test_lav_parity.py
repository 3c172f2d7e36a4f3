"""Byte-parity of lavToPsl / lavToAxt against C goldens."""

import io
import os

from genomealignmenttools_tpu.engines.lav_tools import lav_to_axt, lav_to_psl


def _golden(golden_dir, name):
    return open(os.path.join(golden_dir, name)).read()


def test_lav_to_psl(fixtures_dir, golden_dir):
    out = io.StringIO()
    lav_to_psl(os.path.join(fixtures_dir, "synthetic.lav"), out)
    assert out.getvalue() == _golden(golden_dir, "lavToPsl.psl")


def test_lav_to_psl_bed(fixtures_dir, golden_dir):
    out = io.StringIO()
    lav_to_psl(os.path.join(fixtures_dir, "synthetic.lav"), out, bed=True)
    assert out.getvalue() == _golden(golden_dir, "lavToPsl.bed")


def test_lav_to_psl_target_strand_and_scores(fixtures_dir, golden_dir,
                                             tmp_path):
    out = io.StringIO()
    score_file = str(tmp_path / "scores.txt")
    lav_to_psl(os.path.join(fixtures_dir, "synthetic.lav"), out,
               target_strand="+", score_file=score_file)
    assert out.getvalue() == _golden(golden_dir, "lavToPsl.tstrand.psl")
    assert open(score_file).read() == _golden(golden_dir,
                                              "lavToPsl.scores.txt")


def test_lav_to_axt_2bit(fixtures_dir, golden_dir):
    out = io.StringIO()
    lav_to_axt(os.path.join(fixtures_dir, "synthetic.lav"),
               os.path.join(fixtures_dir, "target.2bit"),
               os.path.join(fixtures_dir, "query.2bit"), out)
    assert out.getvalue() == _golden(golden_dir, "lavToAxt.axt")


def test_lav_to_axt_nib(fixtures_dir, golden_dir):
    out = io.StringIO()
    lav_to_axt(os.path.join(fixtures_dir, "synthetic.lav"),
               os.path.join(fixtures_dir, "nib", "target"),
               os.path.join(fixtures_dir, "nib", "query"), out)
    assert out.getvalue() == _golden(golden_dir, "lavToAxt.nib.axt")


def test_lav_to_axt_fasta(fixtures_dir, golden_dir):
    out = io.StringIO()
    lav_to_axt(os.path.join(fixtures_dir, "synthetic.lav"),
               os.path.join(fixtures_dir, "target.2bit"),
               os.path.join(fixtures_dir, "query.fa"), out, q_is_fa=True)
    assert out.getvalue() == _golden(golden_dir, "lavToAxt.fa.axt")


def test_lav_to_axt_drop_self(fixtures_dir, golden_dir):
    out = io.StringIO()
    lav_to_axt(os.path.join(fixtures_dir, "self.lav"),
               os.path.join(fixtures_dir, "target.2bit"),
               os.path.join(fixtures_dir, "target.2bit"), out,
               drop_self=True)
    assert out.getvalue() == _golden(golden_dir, "lavToAxt.dropSelf.axt")


def test_lav_to_axt_drop_self_score_scheme(fixtures_dir, golden_dir):
    out = io.StringIO()
    lav_to_axt(os.path.join(fixtures_dir, "self.lav"),
               os.path.join(fixtures_dir, "target.2bit"),
               os.path.join(fixtures_dir, "target.2bit"), out,
               drop_self=True,
               score_scheme=os.path.join(fixtures_dir, "HoxD55.q"))
    assert out.getvalue() == _golden(golden_dir,
                                     "lavToAxt.dropSelf.hoxd55.axt")
