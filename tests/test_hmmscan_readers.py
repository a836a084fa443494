"""hmmscan summarize pipeline (A4/W1/case_when) + JSON/XML source readers."""

import json

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.pipelines import glamr
from glamr_omics_pipelines_spark.sources.readers import (read_json_records,
                                                         read_xml_elements)

TBLOUT = """\
# nhmmscan tblout
16S_bac      -   read1 - 5 900 12 880 10 890 1500 + 1e-50 250.0 1.1 Bacterial 16S
16S_arc      -   read1 - 5 880 15 860 12 870 1480 + 1e-20 110.0 0.9 Archaeal 16S
18S_euk      -   read2 - 3 800 20 700 18 710 1700 - 1e-33 170.5 0.4 Eukaryotic 18S
16S_bac      -   read3 - 5 900 12 880 10 890 1500 + 1e-10  80.0 1.0 Bacterial 16S
16S_bac      -   read4 - 5 901 13 881 11 889 1500 + 1e-44 210.0 1.2 Bacterial 16S
"""


def test_summarize_hmmscan(spark, tmp_path):
    p = tmp_path / "hits.tblout"
    p.write_text(TBLOUT)
    hits = glamr.load_hmm_tblout(spark, str(p))
    assert hits.count() == 5  # comment line dropped

    winners, summary = glamr.summarize_hmmscan(hits)
    by_read = {r.query_name: r for r in winners.collect()}
    # read1: 16S_bac wins on lower evalue
    assert by_read["read1"].target_name == "16S_bac"
    s = {r.target_name: r for r in summary.collect()}
    assert s["16S_bac"].n == 3
    assert s["16S_bac"].median_score == 210.0   # exact median of 250/80/210
    assert s["16S_bac"].gene == "16S" and s["16S_bac"].tax_group == "bac"
    assert s["18S_euk"].tax_group == "euk"


def test_read_json_records(spark, tmp_path):
    p = tmp_path / "runinfo.json"
    p.write_text("\n".join(json.dumps(d) for d in [
        {"run": "SRR1", "spots": 1500, "layout": "PAIRED"},
        {"run": "SRR2", "spots": 800, "layout": "SINGLE"}]))
    df = read_json_records(spark, str(p))
    got = {r.run: r.spots for r in df.collect()}
    assert got == {"SRR1": 1500, "SRR2": 800}


def test_read_xml_elements(spark, tmp_path):
    p = tmp_path / "sra.xml"
    p.write_text("""<EXPERIMENT_PACKAGE_SET>
      <EXPERIMENT accession="SRX1"><TITLE>meta G</TITLE></EXPERIMENT>
      <EXPERIMENT accession="SRX2"><TITLE>amplicon</TITLE></EXPERIMENT>
    </EXPERIMENT_PACKAGE_SET>""")
    df = read_xml_elements(spark, str(p), "EXPERIMENT")
    rows = df.collect()
    assert len(rows) == 2
    accs = {r["_accession"] for r in rows}
    assert accs == {"SRX1", "SRX2"}
