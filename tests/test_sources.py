"""Source-connector tests: delimiter sniffing, extension dispatch, catalog."""

import os

import pytest

from data_quality_check_spark import sources as S


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    (d / "comma.csv").write_text("a,b,c\n1,2,3\n4,5,6\n")
    (d / "semi.csv").write_text("a;b;c\n1;2;3\n4;5;6\n")
    (d / "tab.csv").write_text("a\tb\tc\n1\t2\t3\n")
    return d


def test_sniff_delimiter(spark, csv_dir):
    assert S.sniff_delimiter(spark, str(csv_dir / "comma.csv")) == ","
    assert S.sniff_delimiter(spark, str(csv_dir / "semi.csv")) == ";"
    assert S.sniff_delimiter(spark, str(csv_dir / "tab.csv")) == "\t"


def test_read_csv_sniffed(spark, csv_dir):
    for name in ["comma.csv", "semi.csv"]:
        df = S.read_csv(spark, str(csv_dir / name))
        assert df.columns == ["a", "b", "c"]
        assert df.count() == 2
        assert df.schema["a"].dataType.typeName() in ("integer", "long")


def test_read_csv_explicit_schema_skips_inference(spark, csv_dir):
    df = S.read_csv(spark, str(csv_dir / "comma.csv"), schema="a string, b string, c string")
    assert [f.dataType.typeName() for f in df.schema.fields] == ["string"] * 3


def test_load_dispatch_parquet(spark):
    df = S.load(spark, "/root/testdata/sf0.001/region.parquet")
    assert df.count() == 5


def test_load_dispatch_table(spark):
    sdf = S.load(spark, "/root/testdata/sf0.001/nation.parquet")
    sdf.createOrReplaceTempView("nation_view")
    assert S.load(spark, "nation_view").count() == sdf.count()
    assert "nation_view" in S.list_tables(spark)


def test_jdbc_reader_builds_plan():
    # no JDBC database in this environment: assert the reader wiring fails with
    # a driver/connect error, not a our-code error
    import data_quality_check_spark as dqx

    spark = dqx.get_spark()
    with pytest.raises(Exception) as ei:
        S.read_jdbc_query(
            spark, "jdbc:postgresql://localhost:1/none", "SELECT 1", driver="org.postgresql.Driver"
        ).count()
    assert "postgresql" in str(ei.value).lower() or "driver" in str(ei.value).lower()


def _write_minimal_xlsx(path, header, rows):
    """Hand-rolled SpreadsheetML writer: enough surface (shared strings,
    numbers, booleans) to exercise the dependency-free reader."""
    import zipfile

    shared, sindex = [], {}

    def sref(s):
        if s not in sindex:
            sindex[s] = len(shared)
            shared.append(s)
        return sindex[s]

    def cell(ref, v):
        if isinstance(v, str):
            return f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if v is None:
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    def colref(i):
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(ord("A") + r) + out
        return out

    all_rows = [header] + rows
    body = "".join(
        f'<row r="{ri+1}">' + "".join(cell(f"{colref(ci)}{ri+1}", v) for ci, v in enumerate(row)) + "</row>"
        for ri, row in enumerate(all_rows)
    )
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        z.writestr("xl/workbook.xml", f'<?xml version="1.0"?><workbook {ns}><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>')
        z.writestr("xl/worksheets/sheet1.xml", f'<?xml version="1.0"?><worksheet {ns}><sheetData>{body}</sheetData></worksheet>')
        z.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst {ns} count="{len(shared)}">' + "".join(f"<si><t>{s}</t></si>" for s in shared) + "</sst>",
        )


def test_read_excel_minimal_parser(spark, tmp_path):
    """S2 (reference app_v3.py:701): .xlsx upload → distributed DataFrame.
    openpyxl is absent in this environment, so this exercises the built-in
    SpreadsheetML fallback end to end through load()."""
    from data_quality_check_spark.sources.readers import load

    p = str(tmp_path / "book.xlsx")
    _write_minimal_xlsx(
        p,
        ["name", "amount", "active"],
        [["alice", 12, True], ["bob", 3.5, False], ["carol", None, True]],
    )
    df = load(spark, p)
    assert df.columns == ["name", "amount", "active"]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["alice"]["amount"] == 12 and rows["alice"]["active"] is True
    assert rows["bob"]["amount"] == 3.5 and rows["bob"]["active"] is False
    assert rows["carol"]["amount"] is None


def test_read_http_csv(spark, tmp_path):
    """S3 (reference app_v3.py:702-703): plain-http CSV URL → driver download →
    distributed CSV scan with delimiter sniffing."""
    import http.server
    import threading

    d = tmp_path / "www"
    d.mkdir()
    (d / "data.csv").write_text("a;b;c\n1;x;2.5\n2;y;3.5\n")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(*a, directory=str(d), **kw)  # noqa: E731
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from data_quality_check_spark.sources.readers import load

        url = f"http://127.0.0.1:{srv.server_address[1]}/data.csv"
        df = load(spark, url)
        assert df.columns == ["a", "b", "c"]
        assert df.count() == 2
        assert {r["b"] for r in df.collect()} == {"x", "y"}
    finally:
        srv.shutdown()


def test_cloud_conf_plumbing_lands_hadoop_keys(spark):
    """S4/S5/S6 conf helpers: the Hadoop properties the connectors read must
    land in the session conf (the jars themselves are a deploy concern —
    unexercisable in this sandbox, VERDICT r2 item 5)."""
    S.s3_anonymous_conf(spark)
    assert (
        spark.conf.get("spark.hadoop.fs.s3a.aws.credentials.provider")
        == "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
    )
    S.azure_blob_conf(spark, "myacct", "sekrit==")
    assert (
        spark.conf.get("spark.hadoop.fs.azure.account.key.myacct.dfs.core.windows.net")
        == "sekrit=="
    )
    S.gcs_conf(spark, keyfile="/etc/keys/svc.json")
    assert (
        spark.conf.get("spark.hadoop.google.cloud.auth.service.account.enable")
        == "true"
    )
    assert (
        spark.conf.get("spark.hadoop.google.cloud.auth.service.account.json.keyfile")
        == "/etc/keys/svc.json"
    )


def test_read_excel_ignores_reader_options_and_xls_error(spark, tmp_path):
    """ADVICE r2: load() forwards **options — read_excel must tolerate them;
    a legacy .xls without an engine must raise a clear install hint, not a
    BadZipFile from the xlsx-only fallback."""
    p = str(tmp_path / "t.xlsx")
    _write_minimal_xlsx(p, ["a", "b"], [[1, "x"], [2, "y"]])
    df = S.read_excel(spark, p, inferSchema=True, mergeSchema="true")
    assert df.count() == 2

    import pandas as pd

    xls = str(tmp_path / "legacy.xls")
    with open(xls, "wb") as f:
        f.write(b"\xd0\xcf\x11\xe0not-a-zip")
    try:
        pd.read_excel(xls)
        has_engine = True
    except Exception as e:
        has_engine = not isinstance(e, ImportError)
    if not has_engine:
        with pytest.raises(ImportError, match="xlrd"):
            S.read_excel(spark, xls)


def test_load_local_csv_gz(spark, tmp_path):
    import gzip

    p = tmp_path / "data.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("a,b\n1,x\n2,y\n")
    from data_quality_check_spark.sources.readers import load

    got = load(spark, str(p))
    assert sorted((r["a"], r["b"]) for r in got.collect()) == [(1, "x"), (2, "y")]


def test_xlsx_minimal_parser_handles_refless_cells(tmp_path):
    """SpreadsheetML allows cells without the optional r= reference — they are
    positional. A leading ref-less cell used to crash (out[-1] on an empty
    row) and a later one silently overwrote the previous cell."""
    import zipfile

    from data_quality_check_spark.sources.readers import _read_xlsx_minimal

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{ns}"><sheetData>
<row r="1"><c t="inlineStr"><is><t>h1</t></is></c><c t="inlineStr"><is><t>h2</t></is></c></row>
<row r="2"><c><v>1</v></c><c><v>2</v></c></row>
</sheetData></worksheet>"""
    wb = f"""<?xml version="1.0"?>
<workbook xmlns="{ns}"><sheets><sheet name="s1" sheetId="1" r:id="rId1"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets></workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""
    p = tmp_path / "refless.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = _read_xlsx_minimal(str(p))
    assert rows == [["h1", "h2"], [1, 2]]


def test_layout_audit_multi_file_distribution(spark, tmp_path):
    """A 4-file dataset with skewed per-file rows: counts, min/max, small-file
    flags, and the skew multiple all reflect the real file layout."""
    from data_quality_check_spark.sources.layout import layout_audit

    import pyarrow as pa
    import pyarrow.parquet as pq

    sizes = [10, 20, 30, 140]
    start = 0
    for i, n in enumerate(sizes):
        pq.write_table(
            pa.table({"x": list(range(start, start + n))}),
            str(tmp_path / f"part-{i}.parquet"),
        )
        start += n
    out = layout_audit(spark, str(tmp_path), small_file_rows=25).collect()[0]
    assert out["n_files"] == 4 and out["total_rows"] == 200
    assert out["min_rows_per_file"] == 10 and out["max_rows_per_file"] == 140
    assert out["avg_rows_per_file"] == 50.0
    assert out["n_small_files"] == 2  # 10 and 20 < 25
    assert out["skew_x_mean"] == 2.8  # 140 / 50
