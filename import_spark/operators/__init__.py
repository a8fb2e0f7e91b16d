"""DataFrame→DataFrame operators: extract, link, resolve, canonicalize, merge, checks."""
