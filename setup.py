"""Shim for environments whose setuptools predates native bdist_wheel
(< 70.1) and lack the ``wheel`` backport: enables the legacy editable
path (``pip install -e . --no-use-pep517``).  All metadata lives in
pyproject.toml."""

from setuptools import setup

setup()
