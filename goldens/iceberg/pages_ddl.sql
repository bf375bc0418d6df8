CREATE TABLE IF NOT EXISTS lake.crawl.pages (
    url      string NOT NULL,
    warc_ts  timestamp,
    html     binary,
    text     string,
    lang     string
)
USING iceberg
PARTITIONED BY (days(warc_ts), bucket(1024, url))
TBLPROPERTIES (
    'write.distribution-mode' = 'hash',
    'write.target-file-size-bytes' = '536870912'
)