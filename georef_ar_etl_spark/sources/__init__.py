"""Source connectors: the ingestion edge of the engine (landing-zone file
intake with digest lineage and resume; the WAL-segment layout the engine
replays is produced here)."""
