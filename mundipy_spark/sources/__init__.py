"""Sources & sinks: GeoJSON reader/writer, the synthetic Common-Crawl
pages table, and the checkpoint/lineage table."""
