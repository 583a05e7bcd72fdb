"""APT — "Algorithmic Picture Tree" genetic-programming picture evolution.

TPU-native rebuild of CS-02 Evolving Pics (``Compute-Shader/02_Evolving_Pics/
APT.{h,cpp}`` + embedded GLSL): random expression trees over pixel
coordinates, one per RGB channel, bred by mutation/crossover, evaluated for
every pixel on the device.

Design notes (vs the reference):
  - The reference serializes trees with explicit brace tokens and evaluates
    them in GLSL by repeatedly collapsing innermost scopes with a 3-slot
    pseudo-constant queue (``test.cpp:119-205``) — an O(L^2) scheme born of
    GLSL's lack of recursion.  Here trees serialize to *postfix* programs and
    a single ``lax.scan`` drives a vectorized stack machine: each instruction
    is one fused VPU op over the whole (H, W) pixel grid, O(L) total.
  - Node semantics (23 types) match ``APT::Eval`` (``APT.cpp:115-167``)
    including its quirks: trig operates on degrees-as-radians conversions,
    ``Ceil = int(x) + 1`` and ``Floor = int(x)`` (C truncation!), ``Wrap``
    maps through [-1, 1), ``Div`` is IEEE (inf on zero).
  - Tree editing (insert/mutate/copy/swap/serialize, ``APT.h:652-1051``) is
    host-side Python on a lightweight node class — orchestration, like the
    reference's C++ side.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

D2R = np.pi / 180.0

# Opcodes (order mirrors the reference NODE_TYPE enum, APT.h:31-59).
(
    NONE, MAX, MIN, ATAN2, SIN, COS, TAN, ATAN, LERP, PLUS, MINUS, MULT, DIV,
    NEGATE, SQUARE, CEIL, LOG2, ABS, CLIP, FLOOR, WRAP, CONST, OPX, OPY,
) = range(24)

ARITY = {
    NONE: 0, MAX: 2, MIN: 2, ATAN2: 2, SIN: 1, COS: 1, TAN: 1, ATAN: 1,
    LERP: 3, PLUS: 2, MINUS: 2, MULT: 2, DIV: 2, NEGATE: 1, SQUARE: 1,
    CEIL: 1, LOG2: 1, ABS: 1, CLIP: 2, FLOOR: 1, WRAP: 1, CONST: 0,
    OPX: 0, OPY: 0,
}
NAMES = {
    MAX: "Max", MIN: "Min", ATAN2: "arcTan2", SIN: "Sin", COS: "Cos",
    TAN: "Tan", ATAN: "Atan", LERP: "Lerp", PLUS: "+", MINUS: "-",
    MULT: "*", DIV: "/", NEGATE: "Neg", SQUARE: "Sqr", CEIL: "Ceil",
    LOG2: "Log2", ABS: "Abs", CLIP: "Clip", FLOOR: "Floor", WRAP: "Wrap",
    CONST: "Const", OPX: "X", OPY: "Y",
}
LEAVES = (CONST, OPX, OPY)
UNARY = tuple(k for k, a in ARITY.items() if a == 1)
BINARY = tuple(k for k, a in ARITY.items() if a == 2)
TERNARY = (LERP,)
OPERATORS = UNARY + BINARY + TERNARY


def _trunc(x):
    """C-style float->int truncation (toward zero), as float."""
    return jnp.trunc(x)


def _eval_op(op, a, b, c, data):
    """Evaluate one node type over arrays. Mirrors APT::Eval APT.cpp:115-167."""
    branches = {
        MAX: lambda: jnp.maximum(a, b),
        MIN: lambda: jnp.minimum(a, b),
        ATAN2: lambda: jnp.arctan2(b * D2R, a * D2R),
        SIN: lambda: jnp.sin(a * D2R),
        COS: lambda: jnp.cos(a * D2R),
        TAN: lambda: jnp.tan(a * D2R),
        ATAN: lambda: jnp.arctan(a * D2R),
        LERP: lambda: a + c * (b - a),
        PLUS: lambda: b + a,
        MINUS: lambda: a - b,
        MULT: lambda: b * a,
        DIV: lambda: a / b,
        NEGATE: lambda: -a,
        SQUARE: lambda: a * a,
        CEIL: lambda: _trunc(a) + 1.0,
        LOG2: lambda: jnp.log2(a),
        ABS: lambda: jnp.abs(a),
        CLIP: lambda: jnp.where(a > b, b, jnp.where(a < -b, -b, a)),
        FLOOR: lambda: _trunc(a),
        WRAP: lambda: -1.0 + 2.0 * ((a + 1.0) / 2.0 - _trunc((a + 1.0) / 2.0)),
        CONST: lambda: jnp.broadcast_to(data, a.shape),
        OPX: lambda: a,  # handled at leaf push time; kept for completeness
        OPY: lambda: b,
    }
    return branches[op]()


# ----------------------------------------------------------------------------
# Host-side trees
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class Node:
    op: int
    data: float = 0.0
    children: Optional[List["Node"]] = None

    def __post_init__(self):
        if self.children is None:
            self.children = []
        assert len(self.children) == ARITY[self.op], (self.op, len(self.children))

    def copy(self) -> "Node":
        return Node(self.op, self.data, [c.copy() for c in self.children])

    def size(self) -> int:
        return 1 + sum(c.size() for c in self.children)

    def nodes(self) -> List["Node"]:
        out = [self]
        for c in self.children:
            out += c.nodes()
        return out

    def postfix(self) -> List["Node"]:
        out = []
        for c in self.children:
            out += c.postfix()
        return out + [self]

    def pretty(self, indent: int = 0) -> str:
        """Console tree dump — the reference's tree printer (APT.cpp:195-214)."""
        label = NAMES.get(self.op, "?")
        if self.op == CONST:
            label = f"Const({self.data:.3f})"
        s = "  " * indent + label + "\n"
        return s + "".join(c.pretty(indent + 1) for c in self.children)


def random_tree(rng: np.random.Generator, depth: int = 4, p_leaf: float = 0.3) -> Node:
    """Random expression tree; constants drawn like the reference
    (``(rand() % 10000) / 1000`` -> [0, 10), ``APT.cpp:105``)."""
    if depth <= 0 or rng.uniform() < p_leaf:
        op = int(rng.choice(LEAVES))
        data = float(rng.integers(0, 10000)) / 1000.0 if op == CONST else 0.0
        return Node(op, data)
    op = int(rng.choice(OPERATORS))
    kids = [random_tree(rng, depth - 1, p_leaf) for _ in range(ARITY[op])]
    return Node(op, 0.0, kids)


def mutate(rng: np.random.Generator, tree: Node, p_node: float = 0.15) -> Node:
    """Point mutation: each node may swap to a same-arity type, re-roll its
    constant, or (rarely) be replaced by a fresh subtree (``APT.h:652-1051``
    tree-ops family)."""
    tree = tree.copy()
    for node in tree.nodes():
        r = rng.uniform()
        if r < p_node * 0.2:  # replace subtree
            repl = random_tree(rng, depth=2)
            node.op, node.data, node.children = repl.op, repl.data, repl.children
        elif r < p_node * 0.7:  # same-arity type swap
            pool = [t for t in ARITY if ARITY[t] == ARITY[node.op] and t != NONE]
            node.op = int(rng.choice(pool))
            if node.op == CONST:
                node.data = float(rng.integers(0, 10000)) / 1000.0
        elif r < p_node and node.op == CONST:  # jitter constant
            node.data = float(node.data + rng.normal() * 0.5)
    return tree


def crossover(rng: np.random.Generator, a: Node, b: Node) -> Node:
    """Swap a random subtree of ``a`` with a random subtree of ``b``."""
    child = a.copy()
    nodes = child.nodes()
    target = nodes[int(rng.integers(len(nodes)))]
    donor_nodes = b.nodes()
    donor = donor_nodes[int(rng.integers(len(donor_nodes)))].copy()
    target.op, target.data, target.children = donor.op, donor.data, donor.children
    return child


# ----------------------------------------------------------------------------
# Serialization + vectorized stack-machine evaluation
# ----------------------------------------------------------------------------

MAX_PROGRAM = 64  # cf. the reference's 40-int Eqn buffer (test.cpp:119)
MAX_STACK = 16


def required_stack(tree: Node) -> int:
    """Peak evaluation-stack depth of the tree's postfix program (each
    instruction pops ``arity`` and pushes 1)."""
    depth = mx = 0
    for node in tree.postfix():
        depth += 1 - ARITY[node.op]
        mx = max(mx, depth)
    return mx


def serialize(tree: Node, max_len: int = MAX_PROGRAM) -> np.ndarray:
    """Tree -> (L, 2) float32 postfix program [(opcode, data), ...], padded
    with NONE.  Replaces the reference's brace-token texture serialization."""
    post = tree.postfix()
    assert len(post) <= max_len, f"program too long: {len(post)} > {max_len}"
    need = required_stack(tree)
    assert need <= MAX_STACK, (
        f"program needs stack depth {need} > MAX_STACK={MAX_STACK}; "
        "evaluate_program would silently clip (reject such trees in pick())"
    )
    out = np.zeros((max_len, 2), np.float32)
    for k, node in enumerate(post):
        out[k, 0] = node.op
        out[k, 1] = node.data
    return out


def deserialize(program: np.ndarray) -> Node:
    """Postfix program -> tree (round-trip of ``serialize``)."""
    stack: List[Node] = []
    for op_f, data in program:
        op = int(op_f)
        if op == NONE:
            break
        kids = [stack.pop() for _ in range(ARITY[op])][::-1]
        stack.append(Node(op, float(data), kids))
    assert len(stack) == 1, len(stack)
    return stack[0]


@partial(jax.jit, static_argnames=("max_stack",))
def evaluate_program(program, x, y, max_stack: int = MAX_STACK):
    """Evaluate a postfix program over pixel-coordinate arrays ``x, y``.

    ``program``: (L, 2) f32.  Returns an array shaped like ``x``.  One scan
    step per instruction; every step applies all 23 ops to the stack top via
    ``lax.switch`` — each a single fused elementwise op over the pixel grid.
    """
    shape = x.shape
    stack = jnp.zeros((max_stack,) + shape, jnp.float32)
    sp = jnp.int32(0)  # stack pointer = number of live entries

    arity_table = jnp.asarray([ARITY[k] for k in range(24)], jnp.int32)

    def step(carry, instr):
        stack, sp = carry
        op = instr[0].astype(jnp.int32)
        data = instr[1]
        arity = arity_table[op]
        # Postfix: the LAST-pushed child is on top, so operand 1 sits
        # ``arity`` slots down (reference child0 = first Eval argument).
        a = stack[jnp.maximum(sp - 1, 0)]  # top
        b = stack[jnp.maximum(sp - 2, 0)]
        c = stack[jnp.maximum(sp - 3, 0)]
        x1 = jnp.where(arity == 1, a, jnp.where(arity == 2, b, c))
        x2 = jnp.where(arity == 2, a, b)
        x3 = a

        def mk(k):
            if k in (NONE, OPX):
                return lambda: jnp.broadcast_to(x, a.shape)  # NONE never commits
            if k == OPY:
                return lambda: jnp.broadcast_to(y, a.shape)
            return lambda: _eval_op(k, x1, x2, x3, data)

        result = jax.lax.switch(op, [mk(k) for k in range(24)])
        is_nop = op == NONE
        new_sp = sp - arity  # pop operands; result goes to their slot
        slot = jnp.clip(new_sp, 0, max_stack - 1)
        stack = stack.at[slot].set(jnp.where(is_nop, stack[slot], result))
        return (stack, jnp.where(is_nop, sp, new_sp + 1)), None

    (stack, sp), _ = jax.lax.scan(step, (stack, sp), program)
    return stack[0]


def render_apt(programs, width: int, height: int):
    """Evaluate RGB programs over the pixel grid -> (H, W, 3) raw values.

    ``programs``: (3, L, 2).  Coordinates are raw pixel indices, exactly like
    the kernel (``test.cpp:210-212`` passes pixel_coords floats).
    """
    xs = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, :], (height, width)
    )
    ys = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.float32)[:, None], (height, width)
    )
    chans = [evaluate_program(programs[i], xs, ys) for i in range(3)]
    return jnp.stack(chans, axis=-1)


def normalize_image(img):
    """Min-max normalize to [0,1] for display (the reference relies on the
    display clamp; normalized output is nicer for PNG files)."""
    img = jnp.nan_to_num(img, nan=0.0, posinf=1.0, neginf=-1.0)
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    return (img - lo) / jnp.maximum(hi - lo, 1e-9)


# ----------------------------------------------------------------------------
# The evolving-pictures workload (grid + pick-to-breed loop)
# ----------------------------------------------------------------------------


class EvolvingPictures:
    """Grid of pictures, each 3 trees (RGB); ``pick`` breeds the next
    generation from the chosen picture — the scriptable version of the
    reference's mouse-pick loop (``02_Evolving_Pics/test.cpp:364-376``)."""

    def __init__(self, grid: int = 4, seed: int = 0, depth: int = 4):
        self.rng = np.random.default_rng(seed)
        self.grid = grid
        self.pictures = [
            [random_tree(self.rng, depth) for _ in range(3)]
            for _ in range(grid * grid)
        ]
        self.generation = 0

    def programs(self) -> jnp.ndarray:
        """(P, 3, L, 2) serialized programs for the whole grid."""
        return jnp.asarray(
            np.stack([
                np.stack([serialize(t) for t in trees]) for trees in self.pictures
            ])
        )

    def render_grid(self, width: int = 64, height: int = 64):
        progs = self.programs()
        imgs = jax.vmap(lambda p: render_apt(p, width, height))(progs)
        return imgs  # (P, H, W, 3)

    def pick(self, index: int):
        """Breed generation+1: winner kept, rest = mutations/crossovers."""
        winner = self.pictures[index]
        new = [[t.copy() for t in winner]]
        while len(new) < len(self.pictures):
            if self.rng.uniform() < 0.3:
                other = self.pictures[int(self.rng.integers(len(self.pictures)))]
                child = [crossover(self.rng, a, b) for a, b in zip(winner, other)]
            else:
                child = [mutate(self.rng, t) for t in winner]
            # Guard the serialized-length cap (the reference simply forbids
            # bigger trees on its "small gpu stack", README.md:31) AND the
            # eval-stack depth — deep operator chains from crossover can need
            # more stack than a length-legal program suggests.
            if all(
                t.size() <= MAX_PROGRAM and required_stack(t) <= MAX_STACK
                for t in child
            ):
                new.append(child)
        self.pictures = new
        self.generation += 1
