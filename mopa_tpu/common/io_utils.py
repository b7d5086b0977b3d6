"""Small IO helpers (md5 logging parity with reference ``mopa/common/utils/io.py:4-8``)."""

import hashlib


def get_md5(filename):
    hash_obj = hashlib.md5()
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            hash_obj.update(chunk)
    return hash_obj.hexdigest()
