CREATE TABLE IF NOT EXISTS lake.crawl.chunks (
    url         string NOT NULL,
    chunk_index int    NOT NULL,
    text        string,
    ssml        string,
    spans       string,
    bucket      int
)
USING iceberg
PARTITIONED BY (bucket(1024, url))
TBLPROPERTIES (
    'write.distribution-mode' = 'hash',
    'write.target-file-size-bytes' = '536870912'
)