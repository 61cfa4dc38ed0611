"""Sources and sinks: readers for the reference's formats, write paths."""
