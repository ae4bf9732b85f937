"""Utilities: logging, seeding, reporting artifacts (CSV/XLSX/plots)."""
