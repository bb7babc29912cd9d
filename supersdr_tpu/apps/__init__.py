"""Application assemblies: live KiwiSDR session, headless panadapter."""
