"""Native (C/C++) components, loaded via ctypes.

The reference links native Go/C code (SURVEY.md section 2.2: zktrie gobuild,
c-kzg + blst, the scroll zstd fork). TPU-native equivalents here are C++
shared libraries built by `make native` (see native/Makefile):
  * zstd_codec  — pinned-parameter zstd wrapper over system libzstd
  * zktrie     — Poseidon sparse Merkle trie (C++), bound in trie/
"""
