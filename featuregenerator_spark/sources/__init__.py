"""Sources: synthetic transcript generator + testdata table readers."""
