"""The benign-AOT-spray stderr filter (utils/cache.py).

MULTICHIP_r04's stderr tail was 100% benign ``cpu_aot_loader`` tuning-
feature mismatch spray ("+prefer-no-gather/+prefer-no-scatter ... could
lead to execution errors such as SIGILL"), burying any real error. The
filter drops exactly that class and MUST pass real ISA mismatches and
ordinary lines through — a filter that eats real errors would be worse
than the noise.
"""

import os
import tempfile

from ribca_tpu.utils.cache import (
    install_stderr_aot_filter,
    is_benign_aot_line,
)

BENIGN_DUMP = (
    "E0000 00:00:1755728000.000000  1234 cpu_aot_loader.cc:117] Compiled "
    "machine features [+avx,+avx2,+avx512f,+fma,+sse,+sse2,"
    "+prefer-no-scatter,+prefer-no-gather,-amx-fp16] vs host machine "
    "features: [avx,avx2,avx512f,fma,sse,sse2,amx-int8]. This could lead "
    "to execution errors such as SIGILL.\n"
)
REAL_DUMP = (
    "E0000 00:00:1755728000.000000  1234 cpu_aot_loader.cc:117] Compiled "
    "machine features [+avx,+avx512f,+avx512bf16,+prefer-no-gather] vs "
    "host machine features: [avx]. This could lead to execution errors "
    "such as SIGILL.\n"
)
BENIGN_SINGLE = (
    "E0000 cpu_aot_loader.cc:98] Target machine feature +prefer-no-gather "
    "is not supported by host.\n"
)
REAL_SINGLE = (
    "E0000 cpu_aot_loader.cc:98] Target machine feature +avx512bf16 "
    "is not supported by host.\n"
)


def test_classifier_drops_only_benign_mismatches():
    assert is_benign_aot_line(BENIGN_DUMP)
    assert is_benign_aot_line(BENIGN_SINGLE)
    # real ISA features missing -> NOT benign, must stay loud
    assert not is_benign_aot_line(REAL_DUMP)
    assert not is_benign_aot_line(REAL_SINGLE)
    # ordinary stderr lines are never classified away
    assert not is_benign_aot_line("RuntimeError: something real\n")
    assert not is_benign_aot_line(
        "W0000 other_component.cc:1] prefer-no-gather mentioned "
        "elsewhere\n"
    )
    assert not is_benign_aot_line("")


def test_fd_filter_passes_real_lines_and_drops_spray():
    """End-to-end through the actual fd-2 plumbing: capture fd 2 into a
    temp file, install the filter, write the four line classes to the raw
    fd (as XLA's C++ logger does), uninstall, and check what survived."""
    with tempfile.TemporaryFile() as cap:
        saved = os.dup(2)
        try:
            os.dup2(cap.fileno(), 2)
            uninstall = install_stderr_aot_filter()
            os.write(2, BENIGN_DUMP.encode())
            os.write(2, b"ordinary progress line\n")
            os.write(2, REAL_DUMP.encode())
            os.write(2, BENIGN_SINGLE.encode())
            os.write(2, REAL_SINGLE.encode())
            uninstall()
        finally:
            os.dup2(saved, 2)
            os.close(saved)
        cap.seek(0)
        out = cap.read().decode()
    assert "ordinary progress line" in out
    assert REAL_DUMP.strip() in out
    assert REAL_SINGLE.strip() in out
    assert "prefer-no-scatter" not in out.replace(
        REAL_DUMP, ""
    )  # the benign dump did not survive
    assert BENIGN_SINGLE.strip() not in out


def test_fd_filter_flushes_partial_line_on_uninstall():
    with tempfile.TemporaryFile() as cap:
        saved = os.dup(2)
        try:
            os.dup2(cap.fileno(), 2)
            uninstall = install_stderr_aot_filter()
            os.write(2, b"no trailing newline")
            uninstall()
        finally:
            os.dup2(saved, 2)
            os.close(saved)
        cap.seek(0)
        assert cap.read() == b"no trailing newline"
