"""End-to-end pipeline plans (geoparse -> tile -> join -> sink)."""
