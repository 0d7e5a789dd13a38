"""Google BigQuery I/O (reference: vaex-contrib/vaex/contrib/io/gbq.py:1-197).

Requires ``google-cloud-bigquery`` (and ``google-cloud-bigquery-storage`` for
streaming table reads); both are imported lazily so this module loads in
environments without them — calling any function then raises an actionable
ImportError.
"""

from __future__ import annotations


def _bigquery():
    try:
        from google.cloud import bigquery
        return bigquery
    except ImportError as e:  # pragma: no cover - dependency not in this env
        raise ImportError(
            "BigQuery I/O requires the 'google-cloud-bigquery' package "
            "(pip install google-cloud-bigquery)") from e


def _bigquery_storage():
    try:
        from google.cloud import bigquery_storage
        return bigquery_storage
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Streaming BigQuery table reads require 'google-cloud-bigquery-storage' "
            "(pip install google-cloud-bigquery-storage)") from e


def from_query(query, client_project=None, credentials=None):
    """Run a SQL query on BigQuery and return the result as a DataFrame
    (reference: gbq.py from_query)."""
    import vaex_tpu
    bigquery = _bigquery()
    client = bigquery.Client(project=client_project, credentials=credentials)
    job = client.query(query=query)
    return vaex_tpu.from_arrow_table(job.to_arrow())


def from_table(project, dataset, table, columns=None, condition=None, export=None,
               client_project=None, credentials=None):
    """Stream a BigQuery table into a DataFrame, optionally spilling to an
    Arrow file for memory-mapped access (reference: gbq.py from_table)."""
    import vaex_tpu
    bigquery_storage = _bigquery_storage()
    client = bigquery_storage.BigQueryReadClient(credentials=credentials)
    req_sess = bigquery_storage.types.ReadSession(
        table=f"projects/{project}/datasets/{dataset}/tables/{table}",
        data_format=bigquery_storage.types.DataFormat.ARROW,
    )
    if columns:
        req_sess.read_options.selected_fields = list(columns)
    if condition:
        req_sess.read_options.row_restriction = condition
    parent = f"projects/{client_project or project}"
    session = client.create_read_session(
        parent=parent, read_session=req_sess, max_stream_count=1)
    reader = client.read_rows(session.streams[0].name)
    if export is None:
        return vaex_tpu.from_arrow_table(reader.to_arrow(session))
    import pyarrow as pa
    pages = reader.rows(session).pages
    first = next(pages).to_arrow()
    with pa.OSFile(export, "wb") as sink:
        with pa.ipc.new_file(sink, first.schema) as writer:
            writer.write_batch(first)
            for page in pages:
                writer.write_batch(page.to_arrow())
    return vaex_tpu.open(export)


def to_table(df, dataset, table, job_config=None, client_project=None,
             credentials=None, chunk_size=None, progress=None):
    """Upload a DataFrame to a BigQuery table via parquet load jobs
    (reference: gbq.py to_table)."""
    import tempfile
    import os
    bigquery = _bigquery()
    client = bigquery.Client(project=client_project, credentials=credentials)
    table_bq = f"{dataset}.{table}"
    if job_config is None:
        job_config = bigquery.LoadJobConfig(
            source_format=bigquery.SourceFormat.PARQUET)
    with tempfile.TemporaryDirectory() as tmp:
        if chunk_size is None:
            path = os.path.join(tmp, "upload.parquet")
            df.export_parquet(path)
            with open(path, "rb") as source:
                client.load_table_from_file(source, table_bq, job_config=job_config).result()
        else:
            for i, (i1, i2, tbl) in enumerate(df.to_arrow_table(chunk_size=chunk_size)):
                import pyarrow.parquet as pq
                path = os.path.join(tmp, f"upload-{i}.parquet")
                pq.write_table(tbl, path)
                with open(path, "rb") as source:
                    client.load_table_from_file(source, table_bq, job_config=job_config).result()
                if progress:
                    progress(i2 / len(df))
    return client.get_table(table_bq)
