"""S6 — real JDBC scan against an embedded Derby database (the sandbox
stand-in for the reference's CloudSQL Postgres): filter pushdown and
column pruning reach the database, and the backfill row mapper matches
FileBackfillGenerator.scala:62-76 semantics."""

import pytest

from encode_ingest_spark.plans import plan_string
from encode_ingest_spark.sources import file_backfill_requests, jdbc_scan

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "db")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE files (id INT PRIMARY KEY, file_format VARCHAR(20), "
        "data_type VARCHAR(50), md5sum VARCHAR(32), "
        "file_gs_path VARCHAR(200), file_available_in_gcs BOOLEAN, "
        "size_bytes INT)"
    )
    for i in range(40):
        st.execute(
            f"INSERT INTO files VALUES ({i}, 'bam', 'Raw Sequencing Data', "
            f"'md5_{i}', 'gs://bucket/dir/f{i}.bam', "
            f"{'true' if i % 2 == 0 else 'false'}, {i * 100})"
        )
    conn.close()
    return f"jdbc:derby:{db}"


def test_jdbc_scan_pushes_filters_and_prunes_columns(spark, derby_url):
    df = jdbc_scan(spark, derby_url, table="files", driver=DRIVER)
    q = df.filter("size_bytes > 2000").select("id", "file_gs_path")
    plan = plan_string(q, mode="simple")
    assert "PushedFilters" in plan and "GreaterThan(SIZE_BYTES,2000)" in plan
    assert "ReadSchema: struct<ID:int,FILE_GS_PATH:string>" in plan  # pruned
    assert q.count() == 19


def test_jdbc_pushed_query_plus_backfill_mapper(spark, derby_url):
    # the reference's exact shape: pushed-down SQL query (DB-side WHERE)
    # + row-mapper projection (FileBackfillGenerator.scala:46-49,62-76)
    df = jdbc_scan(
        spark,
        derby_url,
        query="SELECT file_format, data_type, md5sum, file_gs_path "
        "FROM files WHERE file_available_in_gcs",
        driver=DRIVER,
    )
    out = {r.source_path: r.target_path for r in file_backfill_requests(
        df,
        format_col="FILE_FORMAT", type_col="DATA_TYPE",
        md5_col="MD5SUM", path_col="FILE_GS_PATH",
    ).collect()}
    assert len(out) == 20  # only file_available_in_gcs rows came back
    assert out["gs://bucket/dir/f0.bam"] == \
        "/raw-sequencing-data/bam/md5_0/f0.bam"
