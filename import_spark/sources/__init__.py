"""Sources: transcript generator/reader, MCF/TMCF/CSV readers."""
