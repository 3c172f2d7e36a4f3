"""Drop-in command surface for the toolkit.

One multiplexed entry point (`python -m genomealignmenttools_tpu.cli.main` or
the `gat` console script) whose subcommands mirror the reference binaries:
scoreChain, chainNet, chainCleaner, chainSort, netFilterNonNested,
repeatFiller, ...  Flags follow the reference's single-dash -name=value
convention so existing pipelines can switch without edits.
"""

from __future__ import annotations

import sys


def _parse_kent_args(argv: list[str]) -> tuple[list[str], dict[str, str]]:
    """Parse kent-style args: positional plus -flag / -flag=value."""
    pos: list[str] = []
    opts: dict[str, str] = {}
    for a in argv:
        if a.startswith("-") and len(a) > 1 and not a[1].isdigit():
            body = a.lstrip("-")
            if "=" in body:
                k, v = body.split("=", 1)
                opts[k] = v
            else:
                opts[body] = ""
        else:
            pos.append(a)
    return pos, opts


def cmd_score_chain(argv: list[str]) -> int:
    from ..engines.score_chain import score_chain_file

    pos, opts = _parse_kent_args(argv)
    if len(pos) != 4:
        print("usage: scoreChain in.chain target.2bit query.2bit out.chain "
              "-linearGap=loose|medium|file [-scoreScheme=file] [-doLocalScore] "
              "[-forceLocalScore] [-returnOnlyScore] [-returnOnlyScoreAndCoords]",
              file=sys.stderr)
        return 255
    score_chain_file(
        pos[0], pos[1], pos[2], pos[3],
        linear_gap=opts.get("linearGap", ""),
        score_scheme=opts.get("scoreScheme"),
        do_local_score="doLocalScore" in opts,
        force_local_score="forceLocalScore" in opts,
        return_only_score="returnOnlyScore" in opts,
        return_only_score_and_coords="returnOnlyScoreAndCoords" in opts,
    )
    return 0


def cmd_chain_sort(argv: list[str]) -> int:
    from ..formats.chain import (read_chains, sort_chains_by_query,
                                 sort_chains_by_score, sort_chains_by_target,
                                 write_chains)

    pos, opts = _parse_kent_args(argv)
    if len(pos) != 2:
        print("usage: chainSort in.chain out.chain [-target|-query]",
              file=sys.stderr)
        return 255
    chains = read_chains(pos[0])
    if "target" in opts:
        chains = sort_chains_by_target(chains)
    elif "query" in opts:
        chains = sort_chains_by_query(chains)
    else:
        chains = sort_chains_by_score(chains)
    out = sys.stdout if pos[1] == "stdout" else None
    if out is not None:
        write_chains(chains, out)
    else:
        write_chains(chains, pos[1])
    return 0


def cmd_chain_net(argv: list[str]) -> int:
    from ..engines.chain_net import chain_net_main
    return chain_net_main(argv)


def cmd_chain_cleaner(argv: list[str]) -> int:
    from ..engines.chain_cleaner import chain_cleaner_main
    return chain_cleaner_main(argv)


def cmd_axt_chain(argv: list[str]) -> int:
    from ..engines.axt_chain import axt_chain_main
    return axt_chain_main(argv)


def cmd_net_filter_non_nested(argv: list[str]) -> int:
    from ..engines.net_filter_nonnested import net_filter_non_nested_main
    return net_filter_non_nested_main(argv)


def cmd_repeat_filler(argv: list[str]) -> int:
    from ..engines.repeat_filler import repeat_filler_main
    return repeat_filler_main(argv)


COMMANDS = {
    "scoreChain": cmd_score_chain,
    "axtChain": cmd_axt_chain,
    "chainSort": cmd_chain_sort,
    "chainNet": cmd_chain_net,
    "chainCleaner": cmd_chain_cleaner,
    "NetFilterNonNested": cmd_net_filter_non_nested,
    "netFilterNonNested": cmd_net_filter_non_nested,
    "RepeatFiller": cmd_repeat_filler,
    "repeatFiller": cmd_repeat_filler,
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print("gat - TPU-native GenomeAlignmentTools\ncommands: "
              + ", ".join(sorted(set(COMMANDS))), file=sys.stderr)
        return 0 if argv else 255
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd}; known: {', '.join(sorted(set(COMMANDS)))}",
              file=sys.stderr)
        return 255
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
