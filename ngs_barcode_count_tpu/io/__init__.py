"""Ingest: FASTQ -> fixed-shape int8 base/quality tensor batches."""
