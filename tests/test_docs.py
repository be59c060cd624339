"""Docs stay truthful: every --flag in docs/ command blocks must exist.

The reference's docs (docs/setup_monocular.md, docs/setup_video.md) are
its de-facto user API; ours mirror them command-for-command. This guard
parses the fenced command blocks and asserts each flag is defined by the
CLI module the command invokes. Flag sets are read statically from the
CLI sources (absl keeps one global flag registry, so the two mains
cannot be co-imported in one process — same property as the reference's
monocular/main.py vs multiframe/main.py).
"""
import re

import pytest

DOCS = ["docs/install.md", "docs/setup_monocular.md", "docs/setup_video.md"]
PKG = "acfm_video_3d_reconstruction_tpu"

# evaluate CLIs import FLAGS from their main CLI and add their own defines
CLI_SOURCES = {
    "monocular_main": [f"{PKG}/cli/monocular_main.py"],
    "monocular_evaluate": [
        f"{PKG}/cli/monocular_evaluate.py", f"{PKG}/cli/monocular_main.py"
    ],
    "multiframe_main": [f"{PKG}/cli/multiframe_main.py"],
    "multiframe_evaluate": [
        f"{PKG}/cli/multiframe_evaluate.py", f"{PKG}/cli/multiframe_main.py"
    ],
}


def defined_flags(cli_key):
    flags = set()
    for path in CLI_SOURCES[cli_key]:
        src = open(path).read()
        flags |= set(
            re.findall(r"flags\.DEFINE_\w+\(\s*\n?\s*\"(\w+)\"", src)
        )
    return flags


def iter_doc_commands():
    """(doc, cli_key, flags) per documented invocation of one of our CLIs
    (quoted reference commands in the same docs are skipped)."""
    out = []
    for doc in DOCS:
        text = open(doc).read()
        for block in re.findall(r"```(?:bash)?\n(.*?)```", text, re.S):
            cmd = block.replace("\\\n", " ")  # join continuation lines
            for line_group in re.split(r"\n(?=\S)", cmd):
                m = re.search(rf"{PKG}\.cli\.(\w+)", line_group)
                if not m or m.group(1) not in CLI_SOURCES:
                    continue
                flags = set(re.findall(r"--([a-z_0-9]+)", line_group))
                out.append((doc, m.group(1), flags))
    return out


COMMANDS = iter_doc_commands()


@pytest.mark.parametrize(
    "doc,cli_key,flags",
    COMMANDS,
    ids=[f"{d.split('/')[-1]}:{k}" for d, k, _ in COMMANDS],
)
def test_documented_flags_exist(doc, cli_key, flags):
    assert flags, f"no flags parsed from a {cli_key} command in {doc}"
    missing = flags - defined_flags(cli_key)
    assert not missing, (
        f"{doc} documents flags {sorted(missing)} that {cli_key} does not define"
    )


def test_docs_cover_all_four_clis():
    assert {k for _, k, _ in COMMANDS} == set(CLI_SOURCES)


def test_flag_parser_sees_the_surface():
    # regression guard for the DEFINE_ regex itself
    assert {"name", "num_lbs", "az_el_cam"} <= defined_flags("multiframe_main")
    assert "optimize" in defined_flags("multiframe_evaluate")
