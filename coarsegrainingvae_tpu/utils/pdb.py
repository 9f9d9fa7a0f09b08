"""Minimal PDB writer for reconstructed proteins.

Replaces the reference's PdbBuilder (pdbutils.py:11-234 in /root/reference):
formats SEQRES + ATOM records from a one-letter sequence and per-atom
coordinates in the atom14 slot convention (data/sidechain.py). Standard PDB
fixed-column layout.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from coarsegrainingvae_tpu.data.sidechain import ATOM_MAP_14, ONE_TO_THREE


def format_atom_line(
    serial: int,
    name: str,
    res_name: str,
    chain: str,
    res_seq: int,
    xyz: Sequence[float],
    element: str,
    occupancy: float = 1.0,
    b_factor: float = 0.0,
) -> str:
    """One fixed-column ATOM record."""
    # atom names shorter than 4 chars start at column 14
    name_field = f" {name:<3s}" if len(name) < 4 else f"{name:<4s}"
    return (
        f"ATOM  {serial:5d} {name_field}{'':1s}{res_name:>3s} {chain:1s}"
        f"{res_seq:4d}{'':4s}{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}"
        f"{occupancy:6.2f}{b_factor:6.2f}{'':10s}{element:>2s}"
    )


def write_pdb(
    path: str,
    seq: str,
    xyz: np.ndarray,
    mapping: np.ndarray,
    channel_idx: np.ndarray,
    atom_mask: Optional[np.ndarray] = None,
    chain: str = "A",
    title: str = "coarsegrainingvae_tpu reconstruction",
) -> None:
    """Dump a backmapped structure (save_pdb / PdbBuilder equivalents,
    sidechain.py:170-185, pdbutils.py:11-234).

    xyz (n, 3) flat atoms; mapping (n,) residue index; channel_idx (n,)
    atom14 slot of each atom.
    """
    xyz = np.asarray(xyz, np.float64)
    lines = [f"TITLE     {title}"]

    # SEQRES records, 13 residues per line
    three = [ONE_TO_THREE[a] for a in seq]
    for i in range(0, len(three), 13):
        row = three[i : i + 13]
        lines.append(
            f"SEQRES {i // 13 + 1:3d} {chain:1s} {len(seq):4d}  " + " ".join(row)
        )

    serial = 1
    for ai in range(xyz.shape[0]):
        if atom_mask is not None and not atom_mask[ai]:
            continue
        res = int(mapping[ai])
        aa = seq[res]
        name = ATOM_MAP_14[aa][int(channel_idx[ai])]
        if not name:
            continue
        lines.append(
            format_atom_line(
                serial, name, ONE_TO_THREE[aa], chain, res + 1, xyz[ai], name[0]
            )
        )
        serial += 1
    lines.append("TER")
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
