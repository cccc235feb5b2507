"""Legacy-path shim: the sandbox image ships setuptools without the
``wheel`` package (and no network), so pip's modern PEP-517 editable
path fails at ``bdist_wheel``. ``python setup.py develop`` (all
metadata lives in pyproject.toml) installs the package + the
``schemax-spark`` console script without needing wheel. With wheel
available, plain ``pip install .`` works and this file is inert."""

from setuptools import setup

setup()
