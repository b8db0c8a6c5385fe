"""Sources: clip tables (batch + streaming), binary files, fixed-width text."""
