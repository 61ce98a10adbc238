"""README query corpus over OSM-shaped fixture tables (filled in below)."""
