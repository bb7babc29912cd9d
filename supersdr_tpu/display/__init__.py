"""Headless rendering: colormaps, waterfall/spectrum raster composition,
stdlib PNG output. Pixel fidelity to pygame is not a goal (SURVEY.md §7);
the data products (color rows, scope trace, dB scales) are."""
