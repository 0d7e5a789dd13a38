"""Function-registry parity audit: reference vaex-core vs vaex_tpu.

Parses the reference registry (/root/reference/packages/vaex-core/vaex/
functions.py + struct.py) by AST-walking @register_function decorations plus
the two loop registrations (the numpy bridge at functions.py:53-106 and the
str_pandas mirror loop at functions.py:2427-2448), then diffs the resulting
public names against vaex_tpu.functions.functions.

Run: python scripts/audit_functions.py   (prints the COMPLIANCE.md section)
"""

import ast
import re
import sys

REF = "/root/reference/packages/vaex-core/vaex"


def _deco_info(d):
    if isinstance(d, ast.Call) and getattr(d.func, "id", "") == "register_function":
        return {k.arg: (k.value.value if isinstance(k.value, ast.Constant) else None)
                for k in d.keywords}
    if isinstance(d, ast.Name) and d.id == "register_function":
        return {}
    return None


def reference_names():
    ref = {}
    for fname in ("functions.py", "struct.py"):
        src = open(f"{REF}/{fname}").read()
        for node in ast.walk(ast.parse(src)):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for d in node.decorator_list:
                    kw = _deco_info(d)
                    if kw is not None:
                        scope = kw.get("scope")
                        name = kw.get("name") or node.name
                        if scope and name.startswith(scope + "_"):
                            full = name
                        elif scope:
                            full = f"{scope}_{name}"
                        else:
                            full = name
                        ref.setdefault(full, scope or "-")
    src = open(f"{REF}/functions.py").read()
    m = re.search(r'numpy_function_mapping = .*?"""(.*?)"""', src, re.S)
    for name in m.group(1).split():
        ref[name.split(":")[0]] = "numpy"
    for k in [k for k in ref if k.startswith("str_")]:
        ref["str_pandas" + k[3:]] = "str_pandas"
    return ref


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/repo")
    from vaex_tpu import functions as F

    ref = reference_names()
    ours = set(F.functions.keys())
    missing = sorted(set(ref) - ours)
    covered = sorted(set(ref) & ours)
    print(f"- reference registered names: **{len(ref)}** "
          f"(incl. {sum(1 for v in ref.values() if v == 'str_pandas')} str_pandas mirrors)")
    print(f"- implemented with identical public name: **{len(covered)}**")
    print(f"- missing: **{len(missing)}**")
    for name in missing:
        print(f"  - `{name}` ({ref[name]})")
    print(f"- extra names beyond the reference (wider numpy bridge, device "
          f"helpers): {len(ours - set(ref))}")
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
