"""Safe expression-string AST engine.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/expresso.py:
validates expression strings against a whitelist of AST nodes, collects names,
renames identifiers, simplifies, and computes symbolic derivatives (used for
uncertainty propagation, reference: vaex/dataframe.py:3648).  Uses the stdlib
``ast`` module + ``ast.unparse`` instead of a hand-rolled printer.
"""

from __future__ import annotations

import ast
import difflib

valid_binary_operators = (
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.BitAnd, ast.BitOr, ast.BitXor, ast.LShift, ast.RShift, ast.MatMult,
)
valid_compare_operators = (ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Eq, ast.NotEq, ast.In, ast.NotIn, ast.Is, ast.IsNot)
valid_unary_operators = (ast.USub, ast.UAdd, ast.Invert, ast.Not)
valid_boolean_operators = (ast.And, ast.Or)
_valid_nodes = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare, ast.Call,
    ast.Name, ast.Constant, ast.Attribute, ast.Subscript, ast.Slice, ast.Index,
    ast.Load, ast.Tuple, ast.List, ast.Dict, ast.keyword, ast.IfExp, ast.Starred,
)


class ExpressionSyntaxError(SyntaxError):
    pass


def parse_expression(expression_string) -> ast.expr:
    expr = ast.parse(expression_string, mode="eval")
    return expr.body


def node_to_string(node) -> str:
    return ast.unparse(node)


def validate_expression(expression, variable_set, function_set=(), names=None):
    """Raise if the expression uses nodes/names/functions outside the allowed
    sets (reference: vaex/expresso.py:73).  Collects used names into `names`."""
    names = names if names is not None else []
    if isinstance(expression, str):
        expression = parse_expression(expression)
    for node in ast.walk(expression):
        if isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Load):
                pass
        elif not isinstance(node, _valid_nodes + valid_binary_operators + valid_compare_operators +
                            valid_unary_operators + valid_boolean_operators):
            raise ExpressionSyntaxError(f"invalid node in expression: {ast.dump(node)}")
    _validate_names(expression, set(variable_set), set(function_set), names)
    return names


def _validate_names(node, variables, functions, names):
    if isinstance(node, ast.Call):
        func = node.func
        if isinstance(func, ast.Name):
            if func.id not in functions and func.id not in variables:
                matches = difflib.get_close_matches(func.id, list(functions))
                msg = f"function {func.id!r} is not defined"
                if matches:
                    msg += f", did you mean {matches[0]!r}?"
                raise NameError(msg)
        elif isinstance(func, ast.Attribute):
            _validate_names(func.value, variables, functions, names)
        for arg in node.args:
            _validate_names(arg, variables, functions, names)
        for kw in node.keywords:
            _validate_names(kw.value, variables, functions, names)
        return
    if isinstance(node, ast.Name):
        if node.id not in variables and node.id not in functions:
            matches = difflib.get_close_matches(node.id, list(variables))
            msg = f"column or variable {node.id!r} does not exist"
            if matches:
                msg += f", did you mean {matches[0]!r}?"
            raise NameError(msg)
        if node.id in variables and node.id not in names:
            names.append(node.id)
        return
    for child in ast.iter_child_nodes(node):
        _validate_names(child, variables, functions, names)


def names(expression):
    """All Name identifiers loaded (columns, variables and functions).

    ``df['name']`` subscripts (the escape hatch for column names that are
    not python identifiers, reference: utils.py:417 valid_expression)
    contribute 'name' instead of the bare 'df' marker."""
    if isinstance(expression, str):
        expression = parse_expression(expression)
    out = []
    df_bases = set()
    for node in ast.walk(expression):
        if (isinstance(node, ast.Subscript) and isinstance(node.value, ast.Name)
                and node.value.id == "df" and isinstance(node.slice, ast.Constant)
                and isinstance(node.slice.value, str)):
            df_bases.add(id(node.value))
            if node.slice.value not in out:
                out.append(node.slice.value)
    for node in ast.walk(expression):
        if isinstance(node, ast.Name) and id(node) not in df_bases and node.id not in out:
            out.append(node.id)
    return out


def function_names(expression):
    if isinstance(expression, str):
        expression = parse_expression(expression)
    out = []
    for node in ast.walk(expression):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) and node.func.id not in out:
            out.append(node.func.id)
    return out


def column_names(expression, function_set=()):
    fnames = set(function_names(expression)) | set(function_set)
    return [n for n in names(expression) if n not in fnames]


class _Renamer(ast.NodeTransformer):
    def __init__(self, translation):
        self.translation = translation

    def visit_Name(self, node):
        if node.id in self.translation:
            replacement = self.translation[node.id]
            if isinstance(replacement, ast.AST):
                return replacement
            return ast.copy_location(ast.Name(id=replacement, ctx=node.ctx), node)
        return node


def translate(expression_string, translation) -> str:
    """Rename identifiers; values may be names or full replacement expressions
    (reference: vaex/expresso.py:607 translate, used by Expression._rename and
    virtual-column inlining `Expression.expand`)."""
    node = parse_expression(expression_string)
    translation = {
        k: (parse_expression(v) if isinstance(v, str) and not v.isidentifier() else v)
        for k, v in translation.items()
    }
    node = _Renamer(translation).visit(node)
    return node_to_string(node)


def simplify(expression_string) -> str:
    """Light constant-folding / identity simplification
    (reference: vaex/expresso.py SimplifyExpression)."""
    node = parse_expression(expression_string)
    node = _Simplifier().visit(node)
    return node_to_string(node)


class _Simplifier(ast.NodeTransformer):
    def visit_BinOp(self, node):
        self.generic_visit(node)
        left, right = node.left, node.right
        lval = left.value if isinstance(left, ast.Constant) else None
        rval = right.value if isinstance(right, ast.Constant) else None
        if isinstance(node.op, ast.Mult):
            if rval == 1:
                return left
            if lval == 1:
                return right
            if lval == 0 or rval == 0:
                return ast.copy_location(ast.Constant(value=0), node)
        if isinstance(node.op, ast.Add):
            if rval == 0:
                return left
            if lval == 0:
                return right
        if isinstance(node.op, ast.Sub) and rval == 0:
            return left
        if isinstance(node.op, ast.Div) and rval == 1:
            return left
        if isinstance(node.op, ast.Pow):
            if rval == 1:
                return left
            if rval == 0:
                return ast.copy_location(ast.Constant(value=1), node)
        return node


def derivative(expression, variable_name, simplify_result=True) -> str:
    """Symbolic derivative d(expression)/d(variable_name)
    (reference: vaex/expresso.py:262 Derivative; powers uncertainty
    propagation via the Jacobian, vaex/dataframe.py:3648)."""
    if isinstance(expression, str):
        node = parse_expression(expression)
    else:
        node = expression
    out = node_to_string(_derivative(node, variable_name))
    return simplify(out) if simplify_result else out


def _c(value):
    return ast.Constant(value=value)


def _bin(op, left, right):
    return ast.BinOp(left=left, op=op, right=right)


def _call(name, args):
    return ast.Call(func=ast.Name(id=name, ctx=ast.Load()), args=args, keywords=[])


_DERIVATIVES = {
    "sin": lambda a: _call("cos", [a]),
    "cos": lambda a: ast.UnaryOp(op=ast.USub(), operand=_call("sin", [a])),
    "tan": lambda a: _bin(ast.Div(), _c(1), _bin(ast.Pow(), _call("cos", [a]), _c(2))),
    "exp": lambda a: _call("exp", [a]),
    "log": lambda a: _bin(ast.Div(), _c(1), a),
    "log10": lambda a: _bin(ast.Div(), _c(1), _bin(ast.Mult(), a, _call("log", [_c(10)]))),
    "sqrt": lambda a: _bin(ast.Div(), _c(1), _bin(ast.Mult(), _c(2), _call("sqrt", [a]))),
    "arcsin": lambda a: _bin(ast.Div(), _c(1), _call("sqrt", [_bin(ast.Sub(), _c(1), _bin(ast.Pow(), a, _c(2)))])),
    "arccos": lambda a: ast.UnaryOp(op=ast.USub(), operand=_bin(ast.Div(), _c(1), _call("sqrt", [_bin(ast.Sub(), _c(1), _bin(ast.Pow(), a, _c(2)))]))),
    "arctan": lambda a: _bin(ast.Div(), _c(1), _bin(ast.Add(), _c(1), _bin(ast.Pow(), a, _c(2)))),
    "sinh": lambda a: _call("cosh", [a]),
    "cosh": lambda a: _call("sinh", [a]),
    "tanh": lambda a: _bin(ast.Div(), _c(1), _bin(ast.Pow(), _call("cosh", [a]), _c(2))),
}


def _derivative(node, x):
    if isinstance(node, ast.Constant):
        return _c(0)
    if isinstance(node, ast.Name):
        return _c(1) if node.id == x else _c(0)
    if isinstance(node, ast.UnaryOp):
        d = _derivative(node.operand, x)
        if isinstance(node.op, ast.USub):
            return ast.UnaryOp(op=ast.USub(), operand=d)
        if isinstance(node.op, ast.UAdd):
            return d
        raise ValueError(f"cannot differentiate {ast.dump(node)}")
    if isinstance(node, ast.BinOp):
        u, v = node.left, node.right
        du, dv = _derivative(u, x), _derivative(v, x)
        if isinstance(node.op, ast.Add):
            return _bin(ast.Add(), du, dv)
        if isinstance(node.op, ast.Sub):
            return _bin(ast.Sub(), du, dv)
        if isinstance(node.op, ast.Mult):
            return _bin(ast.Add(), _bin(ast.Mult(), du, v), _bin(ast.Mult(), u, dv))
        if isinstance(node.op, ast.Div):
            num = _bin(ast.Sub(), _bin(ast.Mult(), du, v), _bin(ast.Mult(), u, dv))
            return _bin(ast.Div(), num, _bin(ast.Pow(), v, _c(2)))
        if isinstance(node.op, ast.Pow):
            if isinstance(v, ast.Constant):  # u**c -> c*u**(c-1)*du
                return _bin(ast.Mult(), _bin(ast.Mult(), _c(v.value), _bin(ast.Pow(), u, _c(v.value - 1))), du)
            # general: u**v = exp(v log u)
            term = _bin(ast.Add(),
                        _bin(ast.Mult(), dv, _call("log", [u])),
                        _bin(ast.Div(), _bin(ast.Mult(), v, du), u))
            return _bin(ast.Mult(), _bin(ast.Pow(), u, v), term)
        raise ValueError(f"cannot differentiate operator {ast.dump(node.op)}")
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
        fname = node.func.id
        if fname not in _DERIVATIVES:
            raise ValueError(f"no derivative rule for function {fname!r}")
        arg = node.args[0]
        outer = _DERIVATIVES[fname](arg)
        return _bin(ast.Mult(), outer, _derivative(arg, x))
    raise ValueError(f"cannot differentiate {ast.dump(node)}")
