"""Sources: schema'd readers for the driver testdata and file formats."""
